"""VPU microbenchmark: are packed-bf16 elementwise ops faster than f32
on this chip's vector core?

The advance kernel is VPU-issue bound and ~75% of its lane-ops are the
dense shape-polynomial evaluations ([window, KC] per particle chunk).
In quant (int8-deposit) mode the shapes get rounded to 1/84ths anyway,
so evaluating the polynomials in bf16 is physically legal (the effective
assignment function stays deterministic and gather/deposit-consistent).
Whether it is FASTER depends on whether Mosaic packs bf16 lanes 2x —
this probe answers that before any kernel surgery.

Kernel: R repeats of the TSC polynomial + qshape-style round/fold over a
[16, KC] block, f32 vs bf16, identical op graph."""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _poly_kernel(x_ref, o_ref, *, reps: int, dt):
    # Mirrors the kernel's qeval16 structure exactly: Mosaic on v5e
    # rejects bf16 cmpf, so the support selects compare the f32 |u| and
    # only the polynomial arithmetic runs in `dt`.
    x32 = x_ref[...]
    acc = jnp.zeros(x32.shape, jnp.float32)
    for r in range(reps):
        u32 = x32 - (0.13 * r)
        au32 = jnp.abs(u32)
        m_in = au32 <= 0.5
        m_out = au32 <= 1.5
        au = au32.astype(dt)
        inner = 0.75 - au * au
        outer = 0.5 * (1.5 - au) ** 2
        z = jnp.zeros_like(outer)
        s = jnp.where(m_in, inner, jnp.where(m_out, outer, z)).astype(
            jnp.float32)
        q = jnp.round(s * 84.0)
        acc = acc + q
    o_ref[...] = acc


def time_variant(dt, rows=16, kc=4096, reps=32, tiles=2048, n=5):
    f = pl.pallas_call(
        functools.partial(_poly_kernel, reps=reps, dt=dt),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((1, rows, kc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, kc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, rows, kc), jnp.float32),
    )
    x = jnp.linspace(-2.0, 2.0, tiles * rows * kc, dtype=jnp.float32)
    x = x.reshape(tiles, rows, kc)
    jf = jax.jit(f)
    float(jf(x).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        o = jf(x)
    float(o.sum())
    dt_w = (time.perf_counter() - t0) / n
    lane_ops = tiles * rows * kc * reps * 10
    print(f"{dt.__name__:9s}: {dt_w*1e3:7.1f} ms  "
          f"({lane_ops/dt_w/1e12:.2f} Tops/s)", flush=True)
    return dt_w


if __name__ == "__main__":
    a = time_variant(jnp.float32)
    b = time_variant(jnp.bfloat16)
    print(f"bf16 speedup: {a/b:.2f}x", flush=True)
