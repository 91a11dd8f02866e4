"""Permute-leg retune + transpose bound study (VERDICT r2 item 7).

The round-2 permute leg passed at 333 GB/s against a self-chosen 40%-of-
HBM bar.  This experiment (a) re-sweeps the tiled-transpose kernel's
tile configuration on the current toolchain (Mosaic crashes shift per
release — round-2 only YB=ZB=8 compiled), and (b) measures the
XLA-transpose upper bound across shapes/permutations so the bench
constant can cite a measured roofline instead of a chosen one.

Run on the real chip: `python experiments/permute_retune.py`.

MEASURED (v5e 1 chip, 2026-08-18 toolchain):

  kernel tile sweep (bench shape 128x64x64x128 f32, xyzt->tzyx):
    YB=ZB=8 is the ONLY config Mosaic compiles (all larger tiles
    remote_compile HTTP 500, all 4-tiles hit the (8k,128k) block rule)
    -> 337.1 GB/s.  Same conclusion as round 2: keep (8, 8).

  XLA transpose bound study (chained scan, +1.0 in the body):
    full reversal (bench)   (128,64,64,128):  267.7 GB/s  <- baseline
    minor<->major only      (128,64,64,128):  332.4 GB/s
    64^4 reversal           (64,64,64,64)  :  166.3 GB/s
    fat minor reversal      (256,32,32,256):  265.0 GB/s
    copy roofline (v+1)                    :  660.6 GB/s
    swap last two / swap first two / 2D rows measured 1.3-23 TB/s —
    ABOVE HBM peak: XLA elides those transposes (layout assignment /
    forward+inverse cancellation in the 2D chain), so they are not
    movement bounds and are excluded from the baseline.

  Conclusion (promoted to bench.py): the Pallas tiled kernel beats the
  XLA compiler 1.26x on the exact benchmark permutation; the permute
  leg's baseline constant is now the MEASURED 268 GB/s XLA bound
  (scaled by chip HBM) instead of the chosen 0.4*HBM bar.

RE-CONFIRMED (round 4, 2026-08-19 toolchain): identical conclusions —
  (8, 8) is still the only tile Mosaic compiles (338.6 GB/s; all larger
  tiles HTTP 500, all 4-tiles fail the (8k,128k) block rule); XLA full
  reversal 268.3 GB/s, copy roofline 659.2 GB/s.  Nothing to promote.
"""

import statistics
import time

import jax
import jax.numpy as jnp


def timeit(op, x, n1=50, n2=250):
    res = {}
    for n in (n1, n2):
        @jax.jit
        def chained(v, n=n):
            def body(c, _):
                return op(c) + 1.0, ()
            c, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.sum(c)
        float(chained(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(chained(x))
            ts.append(time.perf_counter() - t0)
        res[n] = statistics.median(ts)
    return (res[n2] - res[n1]) / (n2 - n1)


def main():
    from superbblas_tpu.ops.permute_pallas import pallas_permute

    jax.config.update("jax_compilation_cache_dir", "/tmp/sbt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    shape = (128, 64, 64, 128)   # the bench shape
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    nbytes = 2 * x.size * 4
    perm = (3, 2, 1, 0)
    ref = jnp.transpose(x, perm)

    print("== kernel tile sweep (bench shape, xyzt->tzyx) ==", flush=True)
    best = (None, 0.0)
    for YB in (8, 16, 32, 64, 4):
        for ZB in (8, 16, 32, 64, 4):
            if shape[1] % YB or shape[2] % ZB:
                continue
            if shape[0] * YB * ZB * shape[3] * 4 > 64 * 2 ** 20:
                continue
            try:
                fn = lambda v, YB=YB, ZB=ZB: pallas_permute(
                    v, perm, blocks=(YB, ZB))
                ok = bool(jnp.array_equal(jax.jit(fn)(x), ref))
            except Exception as e:
                print(f"  YB={YB:2d} ZB={ZB:2d}: SKIP {type(e).__name__}: "
                      f"{str(e)[:80]}", flush=True)
                continue
            if not ok:
                print(f"  YB={YB:2d} ZB={ZB:2d}: WRONG", flush=True)
                continue
            dt = timeit(fn, x)
            gb = nbytes / dt / 1e9
            if gb > best[1]:
                best = ((YB, ZB), gb)
            print(f"  YB={YB:2d} ZB={ZB:2d}: {dt*1e3:7.3f} ms "
                  f"{gb:7.1f} GB/s", flush=True)
    print(f"BEST tile: {best[0]} at {best[1]:.1f} GB/s", flush=True)

    print("== XLA transpose bound study ==", flush=True)
    cases = [
        ((128, 64, 64, 128), (3, 2, 1, 0), "full reversal (bench)"),
        ((128, 64, 64, 128), (3, 1, 2, 0), "minor<->major only"),
        ((128, 64, 64, 128), (0, 1, 3, 2), "swap last two"),
        ((128, 64, 64, 128), (1, 0, 2, 3), "swap first two (minor fixed)"),
        ((1024, 16384), (1, 0), "2D tall"),
        ((4096, 4096), (1, 0), "2D square"),
        ((16384, 1024), (1, 0), "2D wide"),
        ((64, 64, 64, 64), (3, 2, 1, 0), "64^4 reversal"),
        ((256, 32, 32, 256), (3, 2, 1, 0), "fat minor reversal"),
    ]
    for shp, p, label in cases:
        v = jax.random.normal(jax.random.PRNGKey(1), shp, jnp.float32)
        nb = 2 * v.size * 4
        # +1.0 in the chain defeats T(T(x)) cancellation; a permutation
        # composed with itself may not be identity, fine — shapes must
        # match for scan carry, so only use involutive perms
        vv = jnp.transpose(v, p)
        if vv.shape != v.shape:
            # shape-changing perm: chain forward+inverse pairs (inverse
            # perm computed on HOST — a traced argsort cannot feed a
            # static transpose axis list)
            import numpy as _np
            pinv = tuple(int(i) for i in _np.argsort(p))
            fn = jax.jit(lambda a: jnp.transpose(
                jnp.transpose(a, p) + 1.0, pinv))
            dt = timeit(fn, v) / 2.0
        else:
            dt = timeit(jax.jit(lambda a: jnp.transpose(a, p)), v)
        print(f"  {label:32s} {str(shp):22s}: {nb / dt / 1e9:7.1f} GB/s",
              flush=True)

    # streaming copy roofline for context
    dt = timeit(jax.jit(lambda a: a), x)
    print(f"  copy roofline (v+1)              : "
          f"{nbytes / dt / 1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
