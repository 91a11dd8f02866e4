"""Probe: bf16 compute in the SoA stencil kernel (round-3 VERDICT item 7).

The stencil kernel stores operands bf16 but converts to f32 at load
because (a) pltpu.roll was 32-bit-only and (b) VPU MACs are f32.  This
probe checks, per toolchain:

  1. does pltpu.roll now COMPILE on bf16 operands?  (If yes, the early
     conversion can move past the roll, halving the rolled register
     traffic.)
  2. the i32-bitcast pair-roll fallback for odd shifts: roll the
     [..., T] bf16 lane axis by 1 via two i32 rolls + half-lane
     recombine (shift/or) — counts the op cost against the f32 roll.

Run on the real chip: `python experiments/stencil_bf16_roll_probe.py`.

MEASURED (v5e 1 chip, 2026-08-19, [256, 32, 256] block, n1=100/n2=900):

    f32 roll (convert + roll + add + convert back): 2.3 us
    bf16 pltpu.roll                               : Mosaic HTTP 500
    i32 pair roll via pltpu.bitcast               : 3.1 us, bit-correct

DEAD END, with numbers: pltpu.bitcast(v, int32) DOES work (packs bf16
pairs along the SUBLANE axis, orthogonal to lane rolls, so a T-axis
roll needs no half-lane recombine) and is exactly correct — but it is
1.35x SLOWER than converting to f32 and rolling: the two bitcasts force
Mosaic register relayouts that cost more than the halved register
traffic saves.  Native bf16 roll still crashes the compiler.  Since VPU
MACs are f32 regardless, there is no bf16-compute win available in this
kernel design on this toolchain; bf16 remains a STORAGE format (which
already delivers 11.3-11.5 TF/s end-to-end).  Re-probe per toolchain.
"""

import functools
import statistics
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, x, n1=100, n2=900):
    res = {}
    for n in (n1, n2):
        @jax.jit
        def chained(v, n=n):
            def body(c, _):
                return fn(c), ()
            c, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.sum(c.astype(jnp.float32))
        float(chained(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(chained(x))
            ts.append(time.perf_counter() - t0)
        res[n] = statistics.median(ts)
    return (res[n2] - res[n1]) / (n2 - n1)


SHAPE = (256, 32, 256)     # [rows, Z, T] — big enough to time through
                           # the tunnel (4 MB bf16; tiny blocks resolve
                           # to negative two-point deltas)


def k_roll_bf16(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], 1, 2) + x_ref[...]


def k_roll_f32(x_ref, o_ref):
    v = x_ref[...].astype(jnp.float32)
    o_ref[...] = (pltpu.roll(v, 1, 2) + v).astype(jnp.bfloat16)


def k_roll_pair(x_ref, o_ref):
    # Mosaic pltpu.bitcast packs bf16 pairs along the SUBLANE axis
    # (Z here), which is orthogonal to the rolled LANE axis (T): the
    # T-roll happens directly on the packed i32 tensor — no half-lane
    # recombination at all.
    v = x_ref[...]
    p = pltpu.bitcast(v, jnp.int32)        # [rows, Z/2, T]
    q = pltpu.roll(p, 1, 2)
    y = pltpu.bitcast(q, jnp.bfloat16)     # [rows, Z, T]
    o_ref[...] = y + v


def run(name, kernel, x):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.bfloat16),
        )
        y = jax.block_until_ready(fn(x))
    except Exception as e:
        print(f"  {name:14s}: FAIL {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return None
    dt = timeit(fn, x)
    gb = 2 * x.size * 2 / dt / 1e9
    print(f"  {name:14s}: {dt * 1e6:8.1f} us  {gb:7.1f} GB/s", flush=True)
    return y


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/sbt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE,
                          jnp.float32).astype(jnp.bfloat16)
    y_ref = run("f32 roll", k_roll_f32, x)
    y_b = run("bf16 roll", k_roll_bf16, x)
    y_p = run("i32 pair roll", k_roll_pair, x)
    import numpy as np

    want = np.roll(np.asarray(x, np.float32), 1, 2) + np.asarray(
        x, np.float32)
    for name, y in (("f32", y_ref), ("bf16", y_b), ("pair", y_p)):
        if y is None:
            continue
        err = float(np.max(np.abs(np.asarray(y, np.float32) - want)))
        print(f"  {name} max-err vs host roll: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
