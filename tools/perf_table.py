#!/usr/bin/env python
"""Reference-style runtime performance table.

The reference's test executables print throughput tables at runtime
(tests/dist.cpp:157-330: batched-GEMM GFLOPS, copy bandwidth + overhead
vs memcpy, tensor shift; tests/bsr.cpp:845-868: matvec time per rhs).
This tool prints the same table for the TPU build:

    python tools/perf_table.py
"""

import statistics
import sys
import time

import numpy as np


def two_point(make_fn, n1, n2):
    res = {}
    for n in (n1, n2):
        fn = make_fn(n)
        fn()
        res[n] = statistics.median(
            [(lambda t0: (fn(), time.perf_counter() - t0)[1])(
                time.perf_counter()) for _ in range(5)])
    return (res[n2] - res[n1]) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import bench_bsr, bench_contraction, bench_copy, bench_shift

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}  (1 chip)")
    print(f"{'workload':44s} {'time':>10s} {'rate':>16s}")

    # streaming copy reference (the memcpy baseline of dist.cpp:222-236)
    x = jax.random.normal(jax.random.PRNGKey(0), (128, 64, 64, 128),
                          jnp.float32)

    def make_stream(n):
        @jax.jit
        def f(v):
            def body(c, _):
                return c + 1.0, ()
            c, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.sum(c)
        return lambda: float(f(x))

    dt = two_point(make_stream, 50, 250)
    stream = 2 * x.size * 4 / dt / 1e9
    print(f"{'streaming copy (memcpy reference)':44s} {dt*1e3:8.3f}ms "
          f"{stream:10.1f} GB/s")

    cp_gb, cp_dt = bench_copy()
    print(f"{'label permute xyzt->tzyx (Pallas tiled)':44s} "
          f"{cp_dt*1e3:8.3f}ms {cp_gb:10.1f} GB/s   "
          f"(overhead vs memcpy: {stream / cp_gb:.2f}x)")

    sh_gb, sh_dt = __import__("bench").bench_shift()
    print(f"{'toroidal shift (halo-class)':44s} {sh_dt*1e3:8.3f}ms "
          f"{sh_gb:10.1f} GB/s")

    gf, dt = bench_contraction()
    print(f"{'batched GEMM 8x1024^3 bf16':44s} {dt*1e3:8.3f}ms "
          f"{gf/1e3:10.1f} TFLOP/s")

    # dense.cpp regime: batched small matrices (12x12 per lattice site)
    def make_small_gemm(n):
        # spectral radius ~ sqrt(12): scale so chained products stay
        # bounded instead of overflowing f32 around step ~70
        a = jax.random.normal(jax.random.PRNGKey(2), (4096, 12, 12),
                              jnp.float32) / np.sqrt(12.0)

        @jax.jit
        def f(v):
            def body(c, _):
                return jnp.einsum("kij,kjn->kin", a, c,
                                  precision=jax.lax.Precision.HIGHEST), ()
            c, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.sum(c)
        x = jax.random.normal(jax.random.PRNGKey(3), (4096, 12, 12),
                              jnp.float32)
        return lambda: float(f(x))

    dt = two_point(make_small_gemm, 20, 120)
    gf = 2 * 4096 * 12 ** 3 / dt / 1e9
    print(f"{'batched 12x12 GEMM (dense.cpp regime)':44s} {dt*1e3:8.3f}ms "
          f"{gf/1e3:10.2f} TFLOP/s")

    # per-rhs sweep (reference hist: 1/12/48 rhs, tests/Makefile:100-121)
    for ncols in (1, 12, 48):
        gf, gb, dt = bench_bsr(ncols=ncols)
        print(f"{'Wilson matvec, %2d rhs (per rhs)' % ncols:44s} "
              f"{dt/ncols*1e6:8.1f}us {gf/1e3:10.2f} TFLOP/s")

    # bf16 speed mode (bsr_cast_storage + bf16 fields, 8 rhs)
    gf, _, dt = bench_bsr(storage=jnp.bfloat16, x_dtype=jnp.bfloat16)
    print(f"{'Wilson matvec, bf16 end-to-end (8 rhs)':44s} "
          f"{dt*1e3:8.3f}ms {gf/1e3:10.2f} TFLOP/s")

    # explicit redistribution: the aligned-rows fast path and the
    # gcd-degenerate unaligned geometry through the boxes packer
    bench_mod = __import__("bench")
    rd_gb, rd_dt = bench_mod.bench_redistribute()
    print(f"{'explicit redistribution (aligned rows)':44s} "
          f"{rd_dt*1e3:8.3f}ms {rd_gb:10.1f} GB/s")
    ru_gb, ru_dt = bench_mod.bench_redistribute_unaligned()
    print(f"{'explicit redistribution (unaligned, boxes)':44s} "
          f"{ru_dt*1e3:8.3f}ms {ru_gb:10.1f} GB/s")
    mk_gb, mk_dt = bench_mod.bench_redistribute_masked()
    print(f"{'masked redistribution (parity, boxes)':44s} "
          f"{mk_dt*1e3:8.3f}ms {mk_gb:10.1f} GB/s")

    # gather-mode halo matvec (bounded-irregular operator) + CA power=2
    gh_gf, gh2_gf, gh_dt = bench_mod.bench_gather_halo()
    print(f"{'gather-halo matvec (irregular, 8 rhs)':44s} "
          f"{gh_dt*1e3:8.3f}ms {gh_gf/1e3:10.2f} TFLOP/s")
    print(f"{'gather-halo matvec, CA power=2':44s} "
          f"{'':>10s} {gh2_gf/1e3:10.2f} TFLOP/s")


if __name__ == "__main__":
    main()
