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

field_bytes = x.size * 4
halo_planes = 2 * int(np.prod(dim[1:])) * nc * N * 4    # +-1 plane
stats = {}
for m in re.finditer(r"(all-gather|all-to-all|collective-permute|"
                     r"all-reduce|reduce-scatter)[^=]*?"
                     r"f32\[([\d,]+)\]", hlo):
    kind = m.group(1)
    nel = int(np.prod([int(v) for v in m.group(2).split(",")]))
    stats.setdefault(kind, []).append(nel * 4)
print(f"field bytes/device = {field_bytes // 8}, "
      f"minimal halo bytes/device = {halo_planes}")
for k, v in stats.items():
    print(f"{k}: {len(v)} ops, {sum(v)} bytes total (per-device output)")
if not stats:
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
    from superbblas_tpu.parallel import apply_gather_sharded

    xs_c = cplx.CArray(xs, jnp.zeros_like(xs))
    axes = {c: ("d" if i == 0 else None) for i, c in enumerate("xyzt")}
    hlo2 = jax.jit(lambda v: apply_gather_sharded(op, v, mesh, axes)) \
        .lower(xs_c).compile().as_text()
    import collections
    kinds = collections.Counter(
        m.group(1) for m in re.finditer(
            r" (all-gather|all-to-all|collective-permute|all-reduce|"
            r"reduce-scatter)\(", hlo2))
    print("halo path collectives:", dict(kinds))
