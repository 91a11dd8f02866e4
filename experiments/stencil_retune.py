"""Per-toolchain retune of the SoA stencil kernel (VERDICT r2 item 10).

Mosaic's scheduler shifts between toolchain releases (round-1: v1 4.6 /
v2 3.5 / v3 5.0 TF/s; round-2: v1 7.33 / v2 6.35 / v3 4.86 — v2 nearly
doubled), so the production variant + chunk config must be re-measured
each round rather than trusted.  This sweep times, at the bench shape
(Wilson 8x8x16x128, 8 rhs, f32 and the bf16 end-to-end speed mode):

  v1      plane-DMA kernel (production), auto + forced (nc, Yc) grid
  v2/xin  full-X-in-block kernel
  v3/strm X-streaming scratch-pipeline kernel, nc sweep

Mosaic remote_compile HTTP 500s are configs to skip, not bugs to fix
(CLAUDE.md).  Run on the real chip: `python experiments/stencil_retune.py`.

ROUND-4 RESULT (2026-08-19 toolchain; confirmed by the long-chain
re-timing in stencil_confirm_r4.py — a 69.8 TF/s sweep outlier for
(4,1) was a short-chain timing artifact, re-measured at 6.5-6.7):

  f32 : (8,2) 7.46-7.85 TF/s > (4,4) 7.42-7.54 > (8,1) 7.32
        > old auto (1,8) 7.08-7.23          -> _PREF_CHUNKS promoted
  bf16: (8,2) 11.30-11.54 > (4,4) 10.92-11.42 > old auto 10.36-10.53

BOUND ANALYSIS (why the 8.5 TF/s f32 target is past the roofline of
this DMA scheme): at Yc=2 the five input specs stream (3*Yc+2)/Yc = 4
X-planes per output plane, so per site the kernel moves ~4*768 (x re+im,
8 rhs) + 648 (links) + 768 (y) = 4488 B.  At the measured 7.85 TF/s
(807 us for the 131072-site lattice) that is ~729 GB/s of DMA traffic —
ABOVE the measured same-shape copy roofline (659 GB/s, permute_retune)
and 89% of nominal HBM peak; the f32 kernel is bandwidth-saturated.
Larger Yc lowers the x multiplicity (Yc=8 -> 3.25x) but Mosaic
schedules it slower (7.2), so the byte win never materializes.  The
way past 8.5 is fewer bytes, not scheduling: bf16 storage (half the
bytes) measures 11.3-11.5 TF/s = 1.47x, the speed mode bench.py
already ships.

Reference analog: the per-backend SpMM choice of bsr.h:281-1190 — the
reference picks MKL/builtin/cuSPARSE at build time; here the choice is a
measured per-toolchain promotion.
"""

import statistics
import time

import jax
import jax.numpy as jnp


def timeit(apply_fn, x, n1=20, n2=120):
    """Two-point latency-cancelled chained timing (CLAUDE.md recipe)."""
    res = {}
    for n in (n1, n2):
        @jax.jit
        def chained(v, n=n):
            def body(c, _):
                return apply_fn(c), ()
            c, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.sum(jnp.abs(c.re))
        float(chained(x))  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(chained(x))
            ts.append(time.perf_counter() - t0)
        res[n] = statistics.median(ts)
    return (res[n2] - res[n1]) / (n2 - n1)


def main():
    from superbblas_tpu import cplx
    from superbblas_tpu.models import wilson_operator
    from superbblas_tpu.ops import stencil_pallas as sp

    jax.config.update("jax_compilation_cache_dir", "/tmp/sbt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    lat = (8, 8, 16, 128)
    ncols = 8
    k = jax.random.PRNGKey(1)

    def field(dt):
        shape = (ncols, 12) + lat
        return cplx.CArray(
            jax.random.normal(k, shape, jnp.float32).astype(dt),
            jax.random.normal(jax.random.fold_in(k, 9), shape,
                              jnp.float32).astype(dt))

    results = []
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        op = wilson_operator(lat, mass=0.1, key=0, dtype=jnp.complex64,
                             layout="soa",
                             storage_dtype=(None if dt == jnp.float32
                                            else dt))
        x = field(dt)
        flops = op.flops_per_matvec(ncols, complex_dtype=True)
        blocks, kron, offs = op.blocks, op.kron, op.offsets
        want = None

        def run(name, fn):
            nonlocal want
            try:
                y = jax.block_until_ready(fn(x))
            except Exception as e:
                print(f"  {tag} {name:24s}: SKIP "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                return
            if want is None:
                want = y
            else:
                err = float(jnp.max(jnp.abs(
                    y.re.astype(jnp.float32) - want.re.astype(jnp.float32))))
                scale = float(jnp.max(jnp.abs(want.re))) or 1.0
                if err / scale > (1e-4 if dt == jnp.float32 else 2e-2):
                    print(f"  {tag} {name:24s}: WRONG rel-err "
                          f"{err / scale:.2e}", flush=True)
                    return
            dtm = timeit(fn, x)
            tf = flops / dtm / 1e12
            results.append((tag, name, tf))
            print(f"  {tag} {name:24s}: {dtm * 1e6:8.1f} us  "
                  f"{tf:6.2f} TF/s", flush=True)

        run("v1 auto", lambda v: sp.stencil_matvec_soa(
            blocks, kron, v, offs, 3, 3))
        for Yc in (8, 4, 2, 1):
            for nc in (8, 4, 2, 1):
                run(f"v1 nc={nc} Yc={Yc}",
                    lambda v, nc=nc, Yc=Yc: sp.stencil_matvec_soa(
                        blocks, kron, v, offs, 3, 3, chunks=(nc, Yc)))
        run("v2 xin auto", lambda v: sp.stencil_matvec_soa_xin(
            blocks, kron, v, offs, 3, 3))
        for nc in (8, 4, 2, 1):
            run(f"v3 stream nc={nc}",
                lambda v, nc=nc: sp.stencil_matvec_soa_stream(
                    blocks, kron, v, offs, 3, 3, nc=nc))

    best = {}
    for tag, name, tf in results:
        if tag not in best or tf > best[tag][1]:
            best[tag] = (name, tf)
    for tag, (name, tf) in best.items():
        print(f"BEST {tag}: {name} at {tf:.2f} TF/s")


if __name__ == "__main__":
    main()
