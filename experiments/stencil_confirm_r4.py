"""Round-4 confirmation run for the stencil chunk promotion.

The r4 sweep (experiments/stencil_retune.py, /tmp/r4_stencil_retune.log)
showed f32 v1 nc=8 Yc=2 at 7.57 TF/s and an implausible nc=4 Yc=1 at
69.8 TF/s (above f32 hardware peak -> timing artifact suspect), bf16
nc=4 Yc=4 at 11.42 TF/s.  This script re-times ONLY the finalists with
longer chains (n1=50, n2=250, median-of-5, repeated twice) and checks
each against the XLA stencil_matvec_soa_reference oracle before any
promotion into _pick_chunks.
"""

import statistics
import time

import jax
import jax.numpy as jnp


def timeit(apply_fn, x, n1=50, n2=250):
    res = {}
    for n in (n1, n2):
        @jax.jit
        def chained(v, n=n):
            def body(c, _):
                return apply_fn(c), ()
            c, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.sum(jnp.abs(c.re))
        float(chained(x))
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

    for dt, tag, configs in (
        (jnp.float32, "f32", [None, (8, 2), (4, 4), (4, 1), (1, 8)]),
        (jnp.bfloat16, "bf16", [None, (4, 4), (8, 2), (2, 8)]),
    ):
        op = wilson_operator(lat, mass=0.1, key=0, dtype=jnp.complex64,
                             layout="soa",
                             storage_dtype=(None if dt == jnp.float32
                                            else dt))
        x = field(dt)
        flops = op.flops_per_matvec(ncols, complex_dtype=True)
        blocks, kron, offs = op.blocks, op.kron, op.offsets
        want = jax.block_until_ready(sp.stencil_matvec_soa_reference(
            blocks, kron, x, offs, 3, 3))
        scale = float(jnp.max(jnp.abs(want.re))) or 1.0
        for cfg in configs:
            name = "auto" if cfg is None else f"nc={cfg[0]} Yc={cfg[1]}"
            fn = (lambda v, c=cfg: sp.stencil_matvec_soa(
                blocks, kron, v, offs, 3, 3, chunks=c))
            try:
                y = jax.block_until_ready(fn(x))
            except Exception as e:
                print(f"  {tag} {name:12s}: SKIP {type(e).__name__}: "
                      f"{str(e)[:80]}", flush=True)
                continue
            err = float(jnp.max(jnp.abs(
                y.re.astype(jnp.float32) - want.re.astype(jnp.float32))))
            rel = err / scale
            if rel > (1e-4 if tag == "f32" else 2e-2):
                print(f"  {tag} {name:12s}: WRONG rel-err {rel:.2e}",
                      flush=True)
                continue
            for rep in range(2):
                dtm = timeit(fn, x)
                tf = flops / dtm / 1e12
                print(f"  {tag} {name:12s} rep{rep}: {dtm * 1e6:8.1f} us "
                      f" {tf:6.2f} TF/s  (rel-err {rel:.1e})", flush=True)


if __name__ == "__main__":
    main()
