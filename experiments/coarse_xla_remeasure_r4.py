"""Round-4 re-measure of the multigrid coarse-shape batched GEMM.

CLAUDE.md dead-end note: XLA's batched dot_general moved 2.1x between
the round-1 and round-2 toolchains at the K=288 coarse shape (1.31 ->
2.78 TF/s), so the number must be re-measured each round before any
kernel work (round-3 VERDICT item 5 / weak #6).  Shapes: the 2-level
chiral-MG coarse operator at 8^4 / 2^4 blocking, 2K=8 doubled basis ->
nc = 32 rows, K = ndir*nc = 288, times ncols right-hand sides; plus the
12x12 legacy shape for the perf-table row.

Reference analog: xgemm_batch_strided, blas.h:662-812.
"""

import statistics
import time

import jax
import jax.numpy as jnp


def timeit(fn, x, *ops, n1=20, n2=120):
    """fn(carry, *ops); ops passed as jit ARGUMENTS — closing over
    100+ MB constants trips the remote compiler's upload limit
    (HTTP 413)."""
    res = {}
    for n in (n1, n2):
        @jax.jit
        def chained(v, *o, n=n):
            def body(c, _):
                return fn(c, *o), ()
            c, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.sum(c)
        float(chained(x, *ops))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(chained(x, *ops))
            ts.append(time.perf_counter() - t0)
        res[n] = statistics.median(ts)
    return (res[n2] - res[n1]) / (n2 - n1)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/sbt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    key = jax.random.PRNGKey(0)

    for (S, I, K, N) in ((4096, 32, 288, 32), (4096, 32, 288, 128),
                         (4096, 12, 12, 32), (4096, 12, 12, 128)):
        a = jax.random.normal(key, (S, I, K), jnp.float32) / jnp.sqrt(K)
        x = jax.random.normal(jax.random.fold_in(key, 1), (S, K, N),
                              jnp.float32)

        # shape-stable chain: project back to [S, K, N] with a second
        # GEMM (flops counted for both)
        w = jax.random.normal(jax.random.fold_in(key, 2), (S, I, K),
                              jnp.float32) / jnp.sqrt(I)

        def fn2(v, a, w):
            out = jax.lax.dot_general(
                a, v, (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST)   # [S, I, N]
            back = jax.lax.dot_general(
                w, out, (((1,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST)   # [S, K, N]
            return back

        dt = timeit(fn2, x, a, w)
        flops = 2.0 * S * N * (I * K + I * K)    # two GEMMs per step
        tf = flops / dt / 1e12
        ai = 2 * I * K * N / ((I * K + K * N + I * N) * 4)
        roof = min(819e9 * ai / 1e12, 197 / 4)
        print(f"  S={S} [{I}x{K}]@[{K}x{N}] pair: {dt * 1e6:8.1f} us  "
              f"{tf:5.2f} TF/s  (AI {ai:.1f}, ~roofline {roof:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
