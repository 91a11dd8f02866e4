"""Round-3 VERDICT item 6: what does GSPMD lower the gather-mode
distributed matvec to?

The gather path flattens the field to [vol, BD, N] and takes
``jj_flat`` globally (bsr._apply_gather) — under a lattice-axis
sharding, the cross-shard take plausibly all-gathers x.  This probe
builds a bounded-offset gather operator (an open-boundary stencil with
a defect so create_bsr's near-uniform merge cannot rescue it into the
stencil path), shards x over an 8-device axis, and inspects the
OPTIMIZED HLO: which collectives appear and how many bytes they move,
vs the minimal halo (2 boundary planes of the sharded axis).

Run: python experiments/gather_traffic.py  (CPU mesh; the collective
choice is a GSPMD decision, not a backend one)
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import itertools
import re

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from superbblas_tpu import bsr as B
from superbblas_tpu import cplx

dim = (16, 8, 8, 8)         # sharded axis 0 over 8 devices -> 2 planes/rank
nc = 3
offs = [(0, 0, 0, 0)] + [t for mu in range(4) for t in
                         (tuple(1 if a == mu else 0 for a in range(4)),
                          tuple(-1 if a == mu else 0 for a in range(4)))]
maxnnz = len(offs) + 1      # 9 stencil + 1 irregular
rng = np.random.default_rng(0)
sites = list(itertools.product(*[range(d) for d in dim]))
ii = np.zeros(dim, dtype=np.int64)
jj = np.zeros(dim + (maxnnz, 4), dtype=np.int64)
vals = np.zeros(dim + (maxnnz, nc, nc), dtype=np.float64)
for s in sites:
    k = 0
    for off in offs:
        t = tuple((a + o) % d for a, o, d in zip(s, off, dim))
        jj[s][k] = t
        vals[s][k] = rng.standard_normal((nc, nc))
        k += 1
    # one RANDOM long-range neighbor per site: genuinely irregular —
    # no near-uniform merge can express it as a stencil.  Bounded
    # variant (--bounded) keeps it within +-1 plane of axis 0 so the
    # minimal-halo comparison stays meaningful.
    t = tuple(int(rng.integers(0, d)) for d in dim)
    if "--bounded" in sys.argv:
        t = ((s[0] + int(rng.integers(-1, 2))) % dim[0],) + t[1:]
    jj[s][k] = t
    vals[s][k] = rng.standard_normal((nc, nc))
    ii[s] = k + 1

op = B.create_bsr("xyzts", dim + (nc,), "xyztc", dim + (nc,),
                  (1, 1, 1, 1, nc), (1, 1, 1, 1, nc), ii, jj,
                  jnp.asarray(vals))
print("mode:", op.mode, flush=True)
assert op.mode == "gather"

mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("d",))
N = 4
x = jnp.asarray(rng.standard_normal(dim + (nc, N)), jnp.float32)
xs = jax.device_put(x, NamedSharding(mesh, P("d", None, None, None,
                                             None, None)))

f = jax.jit(lambda v: B.bsr_krylov(1.0, op, v, "xyztcn"))
compiled = f.lower(xs).compile()
hlo = compiled.as_text()

import collections

_ITEM = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4}


def _line_stats(hlo2):
    """Per-kind (count, result bytes) from optimized-HLO text: the
    result type precedes the op kind (`%n = f32[...] all-reduce(`).
    Async pairs count the `-start` line only (its result carries the
    payload shape; the `-done` adds nothing)."""
    kinds = collections.Counter()
    nbytes = collections.Counter()
    for line in hlo2.splitlines():
        m = re.search(
            r"(all-gather|all-to-all|collective-permute|all-reduce|"
            r"reduce-scatter)(-start)?\(", line)
        if not m or " = " not in line:
            continue
        if m.group(1) + "-done(" in line:
            continue
        kind = m.group(1)
        kinds[kind] += 1
        head = line.split(m.group(0))[0].split(" = ")[-1]
        for tm in re.finditer(r"(f32|f64|bf16|s32)\[([\d,]*)\]", head):
            shp = [int(v) for v in tm.group(2).split(",") if v]
            nbytes[kind] += _ITEM[tm.group(1)] * int(np.prod(shp or [1]))
    return kinds, nbytes


field_bytes = x.size * 4
halo_planes = 2 * int(np.prod(dim[1:])) * nc * N * 4    # +-1 plane
kinds0, bytes0 = _line_stats(hlo)
print(f"field bytes/device = {field_bytes // 8}, "
      f"minimal halo bytes/device = {halo_planes}")
for k in kinds0:
    print(f"{k}: {kinds0[k]} ops, {bytes0[k]} bytes total "
          "(per-device output)")
if not kinds0:
    print("no collectives matched — dumping op names:")
    for line in hlo.splitlines():
        if "all-" in line or "collective" in line:
            print(" ", line.strip()[:120])

# FINDING (this run, 16x8x8x8 nnz=10 nc=3 N=4, 8-way shard on axis 0):
#   GSPMD lowers the cross-shard take to
#     all-reduce f32[8192,10,3,4]  = vol * nnz * BD * N * 4 B ~ 3.9 MB
#   per matvec per direction — ~80x the minimal +-1-plane halo
#   (49 KB) and ~10x a full-field all-gather.  The plan-based halo
#   path below (parallel/gather_sharded.py, shipped from this probe)
#   emits ONLY the 2 collective-permutes of the halo exchange.
if "--bounded" in sys.argv:
    import collections

    from superbblas_tpu.parallel import (apply_gather_overlap,
                                         apply_gather_sharded)

    xs_c = cplx.CArray(xs, jnp.zeros_like(xs))
    axes = {c: ("d" if i == 0 else None) for i, c in enumerate("xyzt")}

    def cstats(fn, label):
        hlo2 = jax.jit(fn).lower(xs_c).compile().as_text()
        kinds, nbytes = _line_stats(hlo2)
        print(f"{label}: ops={dict(kinds)} bytes={dict(nbytes)}")
        return nbytes

    b1 = cstats(lambda v: apply_gather_sharded(op, v, mesh, axes),
                "halo path (power=1)")
    b2 = cstats(lambda v: apply_gather_sharded(op, v, mesh, axes,
                                               power=2),
                "CA path (power=2, one widened exchange incl. op rows)")
    bo = cstats(lambda v: apply_gather_overlap(op, v, mesh, axes),
                "overlap path (core dot independent of the permutes)")
    cp1 = b1.get("collective-permute", 0)
    cp2 = b2.get("collective-permute", 0)
    print(f"CA break-even: one power=2 exchange moves {cp2} B vs "
          f"{2 * cp1} B for two plain exchanges "
          f"({cp2 / max(2 * cp1, 1):.2f}x bytes for 1/2 the latency "
          f"rounds; op-row shipping dominates when blocks outweigh "
          f"fields)")
    # FINDING (this run, --bounded, W=1): the plain halo path permutes
    # only the field planes; the CA path additionally ships the halo
    # rows' blocks (nnz*BI*BD vs KD*N per site) in the same round —
    # byte-profitable when N*KD >~ nnz*BI, latency-profitable always.
    # The overlap path moves the same bytes as plain; its win is the
    # core dot having no data dependence on the permute start/done.
