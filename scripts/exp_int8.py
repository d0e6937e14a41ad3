"""Probe: int8 MXU dot in Pallas on v5e — support, exactness, speed vs the
HIGHEST-f32 deposit-shaped dot.  Round-3 gate for the int8 matched-
quantization deposit (docs/ROADMAP.md "Ranked next moves" #1)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].sum())


def timeit(fn, *args, n=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


T = 512         # tiles (x8 of the bench's 4096 -- inputs must fit HBM)
K = 26880       # whole-bucket chunk
M, N = 32, 32   # int8 deposit block rows [2nyg, 2nxg]
MD, ND = 64, 48  # HIGHEST deposit block [4nyg, 3nxg]


def k_int8(a_ref, b_ref, o_ref):
    a = a_ref[0].astype(jnp.int8)
    b = b_ref[0].astype(jnp.int8)
    o_ref[0] = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)


def k_f32h(a_ref, b_ref, o_ref):
    a = a_ref[0]
    b = b_ref[0]
    o_ref[0] = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def k_bf16(a_ref, b_ref, o_ref):
    a = a_ref[0].astype(jnp.bfloat16)
    b = b_ref[0].astype(jnp.bfloat16)
    o_ref[0] = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def run(kern, m, n, dtype):
    spec_a = pl.BlockSpec((1, m, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((1, n, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def f(a, b):
        return pl.pallas_call(
            kern,
            grid=(T,),
            in_specs=[spec_a, spec_b],
            out_specs=spec_o,
            out_shape=jax.ShapeDtypeStruct((T, m, n), jnp.float32),
        )(a, b)

    key = jax.random.PRNGKey(0)
    if dtype == "int":
        a = jnp.round(jax.random.uniform(key, (T, m, K)) * 80.0)
        b = jnp.round(jax.random.uniform(jax.random.fold_in(key, 1), (T, n, K)) * 80.0 - 40.0)
    else:
        a = jax.random.normal(key, (T, m, K))
        b = jax.random.normal(jax.random.fold_in(key, 1), (T, n, K))
    jf = jax.jit(f)
    t = timeit(jf, a, b)
    out = jf(a, b)
    if dtype == "int":
        ref = np.einsum("tmk,tnk->tmn", np.asarray(a[:2], np.int64),
                        np.asarray(b[:2], np.int64))
        err = np.abs(np.asarray(out[:2]) - ref).max()
        print(f"  int8 exactness: max |diff| = {err}")
    return t


def main():
    print(f"T={T} K={K}", flush=True)
    t = timeit(jax.jit(lambda a: a * 2.0), jnp.ones((8, 128)))
    try:
        ti = run(k_int8, M, N, "int")
        print(f"int8  [{M},{K}]x[{K},{N}]   {ti*1e3:7.1f} ms", flush=True)
    except Exception as e:
        print("int8 FAILED:", str(e)[:400], flush=True)
    tb = run(k_bf16, M, N, "f")
    print(f"bf16  [{M},{K}]x[{K},{N}]   {tb*1e3:7.1f} ms", flush=True)
    th = run(k_f32h, MD, ND, "f")
    print(f"f32H  [{MD},{K}]x[{K},{ND}]   {th*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
