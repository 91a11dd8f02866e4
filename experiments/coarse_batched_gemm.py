"""Why the coarse-operator (multigrid) matvec sits at ~1.3 TF/s on v5e.

The coarse operator is a batched GEMM: per site, [nc, ndir*nc] @
[ndir*nc, ncols] with nc = ncols = 32 and K = 288.  Findings (v5e,
V = 8^4 sites, f32):

  XLA batched dot_general        1.31 TF/s
  Pallas, per-site jnp.dot, G=8  1.28 TF/s
  Pallas, per-site jnp.dot, G=32 1.33 TF/s
  Pallas, in-kernel dot_general  1.20 TF/s

All formulations tie: the MXU runs 32-row operands at 1/16 fill and
neither XLA nor Mosaic packs independent batch elements into one tile.
The obvious fixes don't pay:

  * block-diagonal packing of 4 sites onto 128 rows fills the tile but
    either quadruples the blocks' HBM traffic (pre-packed: the operator
    is traffic-bound at 302 MB/matvec already) or spends as much VPU
    time building the tile as the MXU saves (in-kernel packing);
  * precision: default (1-pass bf16) vs highest (6-pass) is only
    0.87 -> 1.00 TF/s — confirming fill, not FLOPs, is the limit.

HBM roofline for this shape is ~4.6 TF/s (AI 6.5 flops/byte); closing
the remaining 3.5x requires an MXU batching primitive Mosaic does not
expose today.  Kept as a known limit; re-evaluate on newer toolchains.

(The probe script this summarizes lived at /tmp/coarse_pallas.py during
the session; methodology identical to experiments/permute_pallas.py.)
"""
