"""VPU microbenchmark: do [1, N] particle rows waste sublanes?

The advance kernel keeps every per-particle quantity as a [1, KC] row
(particles on lanes).  If Mosaic lays (1, N) f32 out on (8, 128)-tiled
vregs with 7/8 sublanes padded, every lanewise stage (Boris ~17.5 ms,
position/wrap, q*w) runs at 1/8 VPU utilization and re-blocking the
particle axis as [8, KC/8] would be a major advance-kernel lever; if
(1, N) uses the packed (1, 128) tiling (8 tiles per vreg), the layouts
are equivalent and the surgery is pointless.  This probe answers that
before any kernel change: the SAME Boris-like op chain (mul/add/rsqrt,
R repeats) over the same total elements, shaped [1, KC] vs [8, KC/8]
vs [16, KC/16].
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _boris_kernel(px_ref, py_ref, pz_ref, o_ref, *, reps: int):
    px = px_ref[0]
    py = py_ref[0]
    pz = pz_ref[0]
    h = jnp.float32(0.01)
    for r in range(reps):
        e1 = px * 0.5 + 0.1 * r
        e2 = py * 0.5
        e3 = pz * 0.5
        pxm = px + h * e1
        pym = py + h * e2
        pzm = pz + h * e3
        gi = jax.lax.rsqrt(1.0 + pxm * pxm + pym * pym + pzm * pzm)
        tx, ty, tz = h * e3 * gi, h * e2 * gi, h * e1 * gi
        sf = 2.0 / (1.0 + tx * tx + ty * ty + tz * tz)
        ppx = pxm + (pym * tz - pzm * ty)
        ppy = pym + (pzm * tx - pxm * tz)
        ppz = pzm + (pxm * ty - pym * tx)
        px = pxm + (ppy * tz - ppz * ty) * sf + h * e1
        py = pym + (ppz * tx - ppx * tz) * sf + h * e2
        pz = pzm + (ppx * ty - ppy * tx) * sf + h * e3
    o_ref[0] = px + py + pz


def time_variant(rows, kc, tiles=4096, reps=8, n=5):
    spec = pl.BlockSpec((1, rows, kc), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(_boris_kernel, reps=reps),
        grid=(tiles,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((tiles, rows, kc), jnp.float32),
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (tiles, rows, kc), jnp.float32) * 0.1
    jf = jax.jit(lambda a: f(a, a, a))
    out = jf(x)
    float(out[0, 0, 0])  # sync (axon: block_until_ready doesn't block)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(x)
    float(out.sum())
    return (time.perf_counter() - t0) / n


def main():
    kc0 = 27136 // 2  # half-bucket rows keep the [1, N] variant's VMEM sane
    total = kc0
    for rows in (1, 8, 16):
        kc = total // rows
        t = time_variant(rows, kc)
        el = 4096 * total
        print(f"[{rows:2d}, {kc:5d}]  {t*1e3:7.2f} ms   "
              f"{el / t / 1e9:6.1f} Gelem/s", flush=True)


if __name__ == "__main__":
    main()
