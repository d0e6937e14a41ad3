"""Round-3 probe: is the advance kernel's no-compute floor (~42 ms at the
bench shape) bound by DMA *bytes* or by DMA/buffer *count*?

Three copy-only Pallas kernels over the bench-scale particle store
(4096 tiles x 26880 slots), same grid (T,) as the whole-bucket advance:

  split6  — 6 separate [T,1,cap] inputs, 5 separate outputs (the advance
            kernel's current particle traffic: 11 buffer streams/tile)
  packed  — ONE [T,6,cap] input, ONE [T,5,cap] output (2 streams/tile)
  packed1 — ONE [T,6,cap] in, [T,6,cap] out, single memcpy-style body

HBM speed-of-light for 11 channels is ~5.4 ms; the gap to the measured
floor is either per-stream overhead (packed wins) or a real bandwidth
ceiling (all equal)."""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jax.tree_util.tree_leaves(x)[0][0].sum())


def timeit(fn, *args, n=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


T, CAP = 4096, 26880


def split6_kernel(x, y, px, py, pz, w, xo, yo, pxo, pyo, pzo):
    xo[...] = x[...] + 1.0
    yo[...] = y[...] + 1.0
    pxo[...] = px[...] + 1.0
    pyo[...] = py[...] + 1.0
    pzo[...] = pz[...] + 1.0


def packed_kernel(pin, pout):
    pout[...] = pin[..., :5, :] + 1.0


def packed1_kernel(pin, pout):
    pout[...] = pin[...] + 1.0


def main():
    key = jax.random.PRNGKey(0)
    arrs = [jax.random.normal(jax.random.fold_in(key, i), (T, 1, CAP),
                              jnp.float32) for i in range(6)]
    packed = jnp.concatenate(arrs, axis=1)  # [T, 6, CAP]
    sync([arrs])
    sync([[packed]])

    spec1 = pl.BlockSpec((1, 1, CAP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    @jax.jit
    def run_split6(*a):
        return pl.pallas_call(
            split6_kernel,
            grid=(T,),
            in_specs=[spec1] * 6,
            out_specs=[spec1] * 5,
            out_shape=[jax.ShapeDtypeStruct((T, 1, CAP), jnp.float32)] * 5,
        )(*a)

    def make_packed(nout, kern):
        specin = pl.BlockSpec((1, 6, CAP), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        specout = pl.BlockSpec((1, nout, CAP), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)

        @jax.jit
        def run(a):
            return pl.pallas_call(
                kern,
                grid=(T,),
                in_specs=[specin],
                out_specs=specout,
                out_shape=jax.ShapeDtypeStruct((T, nout, CAP), jnp.float32),
            )(a)
        return run

    t = timeit(run_split6, *arrs)
    gb = (6 + 5) * T * CAP * 4 / 1e9
    print(f"split6  (11 streams): {t*1e3:7.1f} ms  {gb/t:6.0f} GB/s", flush=True)

    run_p = make_packed(5, packed_kernel)
    t = timeit(run_p, packed)
    print(f"packed  (2 streams) : {t*1e3:7.1f} ms  {gb/t:6.0f} GB/s", flush=True)

    run_p1 = make_packed(6, packed1_kernel)
    t = timeit(run_p1, packed)
    gb12 = 12 * T * CAP * 4 / 1e9
    print(f"packed1 (2 streams) : {t*1e3:7.1f} ms  {gb12/t:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
