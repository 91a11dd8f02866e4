"""Batched small GEMM on TPU: what was tried, what the hardware allows.

The multigrid coarse-operator matvec is a batched GEMM: per site,
[nc, ndir*nc] @ [ndir*nc, ncols] with nc = ncols = 32 and K = 288
(V = 8^4 sites, f32).  The reference's xgemm_batch_strided
(blas.h:662-812) exists to make exactly this fast.

## Round 1 findings (v5e)

  XLA batched dot_general        1.31 TF/s
  Pallas, per-site jnp.dot, G=8  1.28 TF/s
  Pallas, per-site jnp.dot, G=32 1.33 TF/s
  Pallas, in-kernel dot_general  1.20 TF/s

All formulations tied at ~1/16 MXU fill.

## Round 2 findings (v5e, chained-scan latency-cancelled timing)

1. **XLA improved**: the same K=288 coarse-shape batched dot_general now
   measures **2.78 TF/s** (60% of its 4.6 TF/s HBM roofline) — 2.1x the
   round-1 number on the current toolchain.  Re-measure before building
   anything.

2. **Block-diagonal MXU packing loses** (both kernels checked in):

   * ``bgemm_blockdiag_probe.py`` — S sites' [I, J] blocks packed
     aligned (IP=JP=16/32) into one 128x128 tile in VMEM.
       I=J=12 N=128: pallas 0.30 vs xla 1.01 TF/s
       I=J=24 N=128: pallas 0.79 vs xla 2.73 TF/s
       I=J=32 N=128: pallas 1.41 vs xla 2.15 TF/s
     One small matmul per grid step leaves the kernel grid-overhead
     bound (~1 us/step), and the S diagonal-block stores serialize with
     the matmul that consumes them (data dependence — Mosaic cannot
     overlap them within a step).

   * ``bgemm_rowpack_probe.py`` — the large-K coarse shape, S=4 sites
     packed along rows, D [128, S*288] with diagonal blocks at
     UNALIGNED column offsets (288 % 128 != 0):
       rowpack 0.74 TF/s vs xla 2.78 TF/s
     The misaligned [32, 288] stores dominate (3.3 ms/call vs 0.87).

3. **Arithmetic-intensity ceilings make the >=10x target physically
   impossible at small K**: per site, flops = 2*I*J*N against
   (I*J + J*N + I*N)*4 bytes:
       12x12 N=32  -> AI 2.5  -> 2.0 TF/s roofline on 819 GB/s
       12x12 N=128 -> AI 2.9  -> 2.3 TF/s
       24x24 N=128 -> AI 5.4  -> 4.4 TF/s (xla already at 62%)
   The only headroom (4.6 TF/s roofline at K=288, xla at 60%) would
   need a packing Mosaic cannot express without either S x block-HBM
   amplification (pre-packed diagonals) or misaligned VPU stores.

## Round 4 re-measure (coarse_xla_remeasure_r4.py, 2026-08-19 toolchain)

Chained two-GEMM shape-stable probe (operands as jit ARGUMENTS — baking
150 MB constants into the program trips the remote compiler's upload
limit, HTTP 413):

      S=4096 [32x288]@[288x 32]:  2.79 TF/s  (AI  7.6, roofline ~6.2)
      S=4096 [32x288]@[288x128]:  6.45 TF/s  (AI 11.8, roofline ~9.6)
      S=4096 [12x 12]@[ 12x 32]:  0.42 TF/s  (AI  2.5, roofline ~2.1)
      S=4096 [12x 12]@[ 12x128]:  1.60 TF/s  (AI  2.9, roofline ~2.3)

XLA did NOT move again (2.78 -> 2.79 at the bench shape); the ≥2 TF/s
coarse-matvec bar holds on XLA alone.  The real lever is RIGHT-HAND-SIDE
BATCHING: ncols 32 -> 128 is 2.3x (6.45 TF/s, 67% of its roofline) —
the multigrid coarse solve should batch RHS through the existing
``cols=True`` machinery rather than grow a custom kernel.

## Conclusion

``ops/batched_gemm_pallas.batched_small_gemm`` therefore routes to
XLA's batched dot_general on TPU by default (the winning backend) and
keeps the block-diagonal kernel behind ``force_pallas=True`` /
``interpret=True`` for re-evaluation on future toolchains.  The
multigrid coarse levels inherit the 2.78 TF/s XLA path; end-to-end
V-cycle time is fine-level dominated (the Wilson smoother), so the
coarse gap is not on the critical path.
"""
