"""Explicit fragment-plan redistribution: the all_to_all fallback path.

GSPMD reshards anything expressible as a NamedSharding, but the reference
supports *arbitrary* partitions — toroidally wrapped, unevenly split,
overlapping (replicated/halo'd) boxes (dist.h:330-560).  This module is
the TPU-native equivalent of the reference's send/receive machinery
(dist.h:1426-1573).

The box-intersection plan is computed host-side (the reference's
get_indices_to_send/receive, dist.h:1789-1852) and — like the reference's
``copy_n_blocking`` (dist.h:798-1010) — stored as **blocked runs**, not
elements: every fragment decomposes into contiguous runs along the last
axis; a common block size B (the gcd of all run lengths, the analog of
the reference's common blocking, dist.h:798-866) makes every run exactly
B elements, so the plan holds one int32 start offset per B elements
instead of one per element.  Plan memory is O(total runs); the descriptors
are per-rank ragged arrays padded only to the per-rank totals.

Two executors share the plan:

  * ``method="ragged"`` — ``lax.ragged_all_to_all`` with true per-peer
    variable counts (the MPI_Alltoallv analog, dist.h:1502-1548).  The
    HLO is TPU/GPU-only; on CPU the same plan fields and offset math run
    through a dense-collective emulation so tests exercise the layout.
  * ``method="dense"`` — classic tiled ``lax.all_to_all`` with per-pair
    slots padded to the max pair run count; works on every backend and is
    the virtual-mesh test path.

Execution happens inside one shard_map as

    gather(runs) -> exchange -> scatter(runs)

and the plan is cached on the (partitions, copy_add) key in a byte-budget
LRU exactly like the reference's plan cache (dist.h:2303-2349 +
cache.h:238-265 / SB_CACHEGB).

Data container: irregular partitions cannot be jax global arrays, so the
distributed tensor is a **stacked-padded local form** ``[nprocs,
*max_local_shape]`` sharded over a 1-D mesh axis (the analog of the
reference's per-rank raw pointers).  ``pack_global``/``unpack_global``
convert between host numpy global arrays and this form for testing and
I/O.

At SBT_DEBUG>=2 every redistribution is replayed **through the actual
collective path** with index-valued payloads and checked against a
plan-independent host oracle — the reference's ``ns_copy_test`` mock-index
layer (dist.h:1919-2116, 2282-2285).
"""

from __future__ import annotations

import functools
import math
from collections import OrderedDict
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .. import cplx, flags
from ..labels import intersect_box, volume
from .partition import Partition, box_minus

__all__ = ["RedistributionPlan", "make_plan", "redistribute_auto", "redistribute_explicit",
           "pack_global", "unpack_global", "may_need_communications"]


def may_need_communications(src: "Partition", dst: "Partition") -> bool:
    """Fast check whether moving data between the partitions requires any
    cross-process traffic (reference ``may_need_communications``,
    dist.h:2159): False when every destination box is fully contained in
    the same rank's source box."""
    if len(src.boxes) != len(dst.boxes):
        return True
    for (sf, ss), (df, ds) in zip(src.boxes, dst.boxes):
        need = volume(ds)
        if need == 0:
            continue
        got = sum(volume(isz) for _, isz in
                  intersect_box(df, ds, sf, ss, src.dim))
        if got < need:
            return True
    return False


def _fragment_runs(ff, fs, sfrm, src_shape, dfrm, dst_shape, dim):
    """Decompose one toroidal fragment into contiguous runs.

    The fragment (``ff``, ``fs``) lives in absolute lattice coordinates
    and is copied from the src box at ``sfrm`` (padded local block shape
    ``src_shape``) to the dst box at ``dfrm`` (shape ``dst_shape``); both
    the fragment and the boxes may wrap toroidally.  Runs go along the
    LAST axis, split where either local map wraps, so within a run both
    flat offsets advance with stride 1 (the contiguity the reference's
    ``copy_n_blocking`` exploits, dist.h:798-866).

    Returns ``(src_starts, dst_starts, lengths)`` int64 arrays: run k
    copies ``lengths[k]`` consecutive elements from flat offset
    ``src_starts[k]`` of the src block to ``dst_starts[k]`` of the dst
    block.
    """
    nd = len(dim)
    sstr = np.ones(nd, np.int64)
    dstr = np.ones(nd, np.int64)
    for a in range(nd - 2, -1, -1):
        sstr[a] = sstr[a + 1] * src_shape[a + 1]
        dstr[a] = dstr[a + 1] * dst_shape[a + 1]
    # prefix-axis local offsets (cartesian outer sums, row-major order)
    spre = np.zeros(1, np.int64)
    dpre = np.zeros(1, np.int64)
    for a in range(nd - 1):
        f, s, D = ff[a], fs[a], dim[a]
        ax = np.arange(f, f + s)
        spre = np.add.outer(spre, ((ax - sfrm[a]) % D) * sstr[a]).reshape(-1)
        dpre = np.add.outer(dpre, ((ax - dfrm[a]) % D) * dstr[a]).reshape(-1)
    # last axis: split at the wrap points of either local map
    f, s, D = ff[-1], fs[-1], dim[-1]
    cuts = {0, s}
    for b in (sfrm[-1], dfrm[-1]):
        c = (b - f) % D
        if 0 < c < s:
            cuts.add(c)
    cs = sorted(cuts)
    src_starts, dst_starts, lens = [], [], []
    for p0, p1 in zip(cs[:-1], cs[1:]):
        a0 = f + p0
        src_starts.append(spre + (a0 - sfrm[-1]) % D)
        dst_starts.append(dpre + (a0 - dfrm[-1]) % D)
        lens.append(np.full(len(spre), p1 - p0, np.int64))
    return (np.concatenate(src_starts), np.concatenate(dst_starts),
            np.concatenate(lens))


def _expand_runs(starts_a: np.ndarray, starts_b: np.ndarray,
                 lens: np.ndarray, B: int):
    """Split variable-length runs into runs of exactly B elements."""
    counts = lens // B
    tot = int(counts.sum())
    run_id = np.repeat(np.arange(len(lens)), counts)
    within = (np.arange(tot) -
              np.repeat(np.cumsum(counts) - counts, counts)) * B
    return starts_a[run_id] + within, starts_b[run_id] + within


class RedistributionPlan:
    """Blocked-run descriptors for one (src, dst) partition pair.

    Fields (all numpy, plan memory O(total runs)):

      * ``block``        — common run length B (elements)
      * ``counts[i, j]`` — number of B-runs rank i sends to rank j
      * ``send_starts[i, :]`` — flat src offsets of rank i's outgoing
        runs, concatenated in destination-rank order, padded with
        ``src_vol`` to the per-rank cap
      * ``recv_starts[j, :]`` — flat dst offsets of rank j's incoming
        runs, concatenated in source-rank order, padded with ``dst_vol``

    Reference analog: the per-peer index/blocking plans of
    get_indices_to_send/receive + copy_n_blocking (dist.h:798-1010,
    1789-1852).
    """

    def __init__(self, src: Partition, dst: Partition, copy_add: str = "copy"):
        if len(src.boxes) != len(dst.boxes):
            raise ValueError("partitions must have the same number of procs")
        n = len(src.boxes)
        dim = src.dim
        self.n = n
        self.src_shape = tuple(
            max((b[1][i] for b in src.boxes), default=0)
            for i in range(len(dim)))
        self.dst_shape = tuple(
            max((b[1][i] for b in dst.boxes), default=0)
            for i in range(len(dim)))
        self.src_vol = volume(self.src_shape)
        self.dst_vol = volume(self.dst_shape)
        self.copy_add = copy_add

        # fragments per (i, j) pair: (src_starts, dst_starts, lens) runs
        pair_runs = [[[] for _ in range(n)] for _ in range(n)]

        def add_fragment(i, j, ff, fs):
            if volume(fs) == 0:
                return
            pair_runs[i][j].append(_fragment_runs(
                ff, fs, src.boxes[i][0], self.src_shape,
                dst.boxes[j][0], self.dst_shape, dim))

        # Prefer the native C++ plan engine (all-pairs fragment sweep);
        # fall back to the Python box algebra.
        from .. import native

        rows = native.fragment_plan(
            np.asarray([[b[0], b[1]] for b in src.boxes]),
            np.asarray([[b[0], b[1]] for b in dst.boxes]),
            dim, copy_add,
        )
        if rows is not None:
            nd = len(dim)
            for row in rows:
                i, j = int(row[0]), int(row[1])
                add_fragment(i, j, tuple(row[2:2 + nd]),
                             tuple(row[2 + nd:2 + 2 * nd]))
        else:
            for j in range(n):
                dfrm, dsize = dst.boxes[j]
                if volume(dsize) == 0:
                    continue
                remaining = [(dfrm, dsize)]
                for i in range(n):
                    sfrm, ssize = src.boxes[i]
                    if volume(ssize) == 0:
                        continue
                    if copy_add == "copy":
                        new_remaining = []
                        frags = []
                        for rf, rs in remaining:
                            frags.extend(
                                intersect_box(rf, rs, sfrm, ssize, dim))
                            new_remaining.extend(
                                box_minus(rf, rs, sfrm, ssize, dim))
                        remaining = new_remaining
                    else:
                        frags = list(
                            intersect_box(dfrm, dsize, sfrm, ssize, dim))
                    for ff, fs in frags:
                        add_fragment(i, j, ff, fs)

        # common block size: gcd of every run length in the plan
        # (the reference's common blocking, dist.h:798-866)
        B = 0
        total_len = 0
        for i in range(n):
            for j in range(n):
                for _, _, lens in pair_runs[i][j]:
                    B = math.gcd(B, int(np.gcd.reduce(lens)))
                    total_len += int(lens.sum())
        self.block = B = max(B, 1)
        if B == 1 and total_len > (64 << 20):
            import warnings

            warnings.warn(
                "redistribution plan degenerated to element-granularity "
                f"runs ({total_len} elements): box starts/sizes share no "
                "common divisor along the last axis", RuntimeWarning)

        counts = np.zeros((n, n), dtype=np.int64)
        pair_src = [[None] * n for _ in range(n)]
        pair_dst = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(n):
                if not pair_runs[i][j]:
                    continue
                ss = np.concatenate([r[0] for r in pair_runs[i][j]])
                dd = np.concatenate([r[1] for r in pair_runs[i][j]])
                ll = np.concatenate([r[2] for r in pair_runs[i][j]])
                se, de = _expand_runs(ss, dd, ll, B)
                pair_src[i][j] = se
                pair_dst[i][j] = de
                counts[i, j] = len(se)
        if counts.max(initial=0) >= np.iinfo(np.int32).max:
            raise ValueError("plan exceeds int32 run indexing")
        self.counts = counts.astype(np.int32)

        cap_send = max(int(counts.sum(axis=1).max(initial=0)), 1)
        cap_recv = max(int(counts.sum(axis=0).max(initial=0)), 1)
        send = np.full((n, cap_send), self.src_vol, dtype=np.int32)
        recv = np.full((n, cap_recv), self.dst_vol, dtype=np.int32)
        for i in range(n):
            parts = [pair_src[i][j] for j in range(n)
                     if pair_src[i][j] is not None]
            if parts:
                cat = np.concatenate(parts)
                send[i, :len(cat)] = cat
        for j in range(n):
            parts = [pair_dst[i][j] for i in range(n)
                     if pair_dst[i][j] is not None]
            if parts:
                cat = np.concatenate(parts)
                recv[j, :len(cat)] = cat
        self.send_starts = send
        self.recv_starts = recv
        self._dense = None   # lazy [n, n, pair_cap] layout for method=dense

        # aligned-rows fast path: when every run start is a multiple of B
        # (grid-to-grid repartitions where boxes share divisors), the
        # local blocks reshape to [vol/B, B] and runs become whole ROWS —
        # jnp.take / row scatter, ~10x the windowed gather on v5e
        self.aligned = bool(
            B > 1 and self.src_vol % B == 0 and self.dst_vol % B == 0
            and (send % B == 0).all() and (recv % B == 0).all())

        self._validate()

    # -- plan-time count-matrix validation (dist.h:1475-1490 analog) ----
    def _validate(self) -> None:
        """Copy-mode plans must write every covered destination element
        exactly once: per dst rank, the incoming runs must be disjoint."""
        if self.copy_add != "copy":
            return
        B = self.block
        for j in range(self.n):
            tot = int(self.counts[:, j].sum())
            if tot == 0:
                continue
            starts = np.sort(self.recv_starts[j, :tot])
            if starts[0] < 0 or starts[-1] + B > self.dst_vol:
                raise ValueError(
                    f"plan writes outside rank {j}'s destination block")
            if np.any(np.diff(starts) < B):
                raise ValueError(
                    f"copy plan covers a destination element of rank {j} "
                    "more than once (overlapping fragments)")

    # -- derived layouts ------------------------------------------------
    @property
    def pair_cap(self) -> int:
        return max(int(self.counts.max(initial=0)), 1)

    def _pair_slices(self):
        """(send_off, recv_off): exclusive prefix sums of counts along
        the peer axes, for slicing the concatenated per-rank arrays."""
        send_off = np.cumsum(self.counts, axis=1) - self.counts
        recv_off = np.cumsum(self.counts, axis=0) - self.counts
        return send_off, recv_off

    def dense_idx(self):
        """Per-pair padded run-start layout [n, n, pair_cap] for the
        tiled-all_to_all executor (pad = src_vol / dst_vol)."""
        if self._dense is None:
            n, s = self.n, self.pair_cap
            pack = np.full((n, n, s), self.src_vol, dtype=np.int32)
            unpack = np.full((n, n, s), self.dst_vol, dtype=np.int32)
            send_off, recv_off = self._pair_slices()
            for i in range(n):
                for j in range(n):
                    c = int(self.counts[i, j])
                    if c == 0:
                        continue
                    o = int(send_off[i, j])
                    pack[i, j, :c] = self.send_starts[i, o:o + c]
                    o = int(recv_off[i, j])
                    unpack[i, j, :c] = self.recv_starts[j, o:o + c]
            self._dense = (pack, unpack)
        return self._dense

    def recv_inverse(self, dense: bool) -> np.ndarray:
        """Copy-mode aligned-unpack inverse map [n, dst_vol/B]:
        inv[j, dst_row] = recv-buffer slot holding that row (out-of-range
        for uncovered rows -> zero fill in the take).  ``dense`` selects
        the [n * pair_cap] dense-exchange slot layout; otherwise the
        ragged source-order concatenation."""
        attr = "_inv_dense" if dense else "_inv_ragged"
        cached = getattr(self, attr, None)
        if cached is not None:
            return cached
        B = self.block
        rows_n = self.dst_vol // B
        oob = np.int32(2 ** 30)
        inv = np.full((self.n, rows_n), oob, dtype=np.int32)
        _, recv_off = self._pair_slices()
        s = self.pair_cap
        for j in range(self.n):
            tot = int(self.counts[:, j].sum())
            if tot == 0:
                continue
            rows = self.recv_starts[j, :tot] // B
            if dense:
                slots = np.empty(tot, np.int32)
                for i in range(self.n):
                    c = int(self.counts[i, j])
                    if c == 0:
                        continue
                    o = int(recv_off[i, j])
                    slots[o:o + c] = i * s + np.arange(c, dtype=np.int32)
            else:
                slots = np.arange(tot, dtype=np.int32)
            inv[j, rows] = slots
        setattr(self, attr, inv)
        return inv

    def pair_elem_indices(self, i: int, j: int):
        """Element-granularity (src_idx, dst_idx) for one rank pair —
        the expansion of the run descriptors, for tests/verification."""
        c = int(self.counts[i, j])
        send_off, recv_off = self._pair_slices()
        o = int(send_off[i, j])
        sr = self.send_starts[i, o:o + c].astype(np.int64)
        o = int(recv_off[i, j])
        dr = self.recv_starts[j, o:o + c].astype(np.int64)
        B = self.block
        off = np.arange(B, dtype=np.int64)
        return ((sr[:, None] + off).reshape(-1),
                (dr[:, None] + off).reshape(-1))

    @property
    def nbytes(self) -> int:
        b = (self.counts.nbytes + self.send_starts.nbytes +
             self.recv_starts.nbytes)
        if self._dense is not None:
            b += self._dense[0].nbytes + self._dense[1].nbytes
        for attr in ("_inv_dense", "_inv_ragged"):
            cached = getattr(self, attr, None)
            if cached is not None:
                b += cached.nbytes
        return b


class _PlanCache:
    """Byte-budget LRU plan cache: the reference caches plans in an LRU
    evicted by SB_CACHEGB (dist.h:2303-2349 + cache.h:21-199, 238-265).
    Budget: SBT_CACHEGB gigabytes (flags.py), plus an entry-count cap."""

    def __init__(self, maxsize: int = 256):
        import threading

        self.maxsize = maxsize
        self._od: "OrderedDict[tuple, RedistributionPlan]" = OrderedDict()
        self.hits = 0
        self.misses = 0
        # the lru_cache this replaced was thread-safe; keep that contract
        # (async savers / threaded users share the cache)
        self._lock = threading.Lock()

    def __call__(self, src: Partition, dst: Partition,
                 copy_add: str = "copy") -> RedistributionPlan:
        key = (src, dst, copy_add)
        with self._lock:
            plan = self._od.get(key)
            if plan is not None:
                self.hits += 1
                self._od.move_to_end(key)
                return plan
            self.misses += 1
        plan = RedistributionPlan(src, dst, copy_add)  # build unlocked
        with self._lock:
            self._od[key] = plan
            budget = int(flags.get_cache_gb() * (1 << 30))
            while len(self._od) > 1 and (
                    len(self._od) > self.maxsize
                    or self._bytes_locked() > budget):
                self._od.popitem(last=False)
        return plan

    def _bytes_locked(self) -> int:
        return sum(p.nbytes for p in self._od.values())

    @property
    def bytes_in_use(self) -> int:
        with self._lock:
            return self._bytes_locked()

    def cache_clear(self) -> None:
        with self._lock:
            self._od.clear()
            self.hits = 0
            self.misses = 0

    def cache_info(self):
        from collections import namedtuple

        Info = namedtuple("CacheInfo",
                          "hits misses maxsize currsize bytes")
        with self._lock:
            return Info(self.hits, self.misses, self.maxsize,
                        len(self._od), self._bytes_locked())


make_plan = _PlanCache()
make_plan.__doc__ = """Plan cache (the reference caches plans in its LRU
keyed by the partition pair, dist.h:2303-2349, evicted by byte budget
like SB_CACHEGB, cache.h:238-265)."""


# ---------------------------------------------------------------------------
# executors


def _gather_runs(flat: jnp.ndarray, starts: jnp.ndarray, B: int):
    """[cap] run starts -> [cap, B] run payloads (flat is pre-padded with
    B zeros so padding starts gather zeros).

    Expressed as a vmapped dynamic_slice so XLA emits ONE gather with
    slice_sizes=(B,) — whole contiguous runs per index.  The naive
    ``flat[starts[:, None] + arange(B)]`` form lowers to element-wise
    gathering and measured ~0.5 GB/s on v5e (650x below the copy
    bandwidth); this form reaches ~7.6 GB/s, and B-aligned plans take
    the row-take path in the executor instead (~78 GB/s)."""
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(flat, (s,), (B,)))(starts)


def _gather_rows(loc: jnp.ndarray, starts: jnp.ndarray, B: int,
                 src_vol: int):
    """Aligned fast path: runs are whole rows of the [vol/B, B] view;
    one jnp.take (row-DMA gather).  Padding starts (== src_vol) are
    out-of-bounds rows and fill with zeros — no copy to append a pad
    row."""
    return jnp.take(loc.reshape(-1, B), starts // B, axis=0,
                    mode="fill", fill_value=0)


def _scatter_rows(vals: jnp.ndarray, starts: jnp.ndarray, dst_vol: int,
                  B: int, copy_add: str, dtype):
    out = jnp.zeros((dst_vol // B + 1, B), dtype)
    rows = starts // B
    if copy_add == "copy":
        out = out.at[rows].set(vals.astype(dtype), mode="drop")
    else:
        out = out.at[rows].add(vals.astype(dtype), mode="drop")
    return out[:dst_vol // B].reshape(-1)


def _take_rows_inverse(vals: jnp.ndarray, inv: jnp.ndarray, dtype):
    """Copy-mode aligned unpack as ONE take: inv[dst_row] = recv slot
    (out-of-range for uncovered rows -> zero fill).  Skips the
    zero-buffer + scatter pass of :func:`_scatter_rows`."""
    return jnp.take(vals.astype(dtype), inv, axis=0,
                    mode="fill", fill_value=0).reshape(-1)


def _scatter_runs(vals: jnp.ndarray, starts: jnp.ndarray, dst_vol: int,
                  B: int, copy_add: str, dtype):
    """[cap, B] payloads -> flat [dst_vol] block; padding starts
    (== dst_vol) land in a throwaway pad zone.  Windowed scatter
    (update_window_dims) for the same reason as :func:`_gather_runs`."""
    out = jnp.zeros((dst_vol + B,), dtype)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    fn = jax.lax.scatter if copy_add == "copy" else jax.lax.scatter_add
    out = fn(out, starts[:, None].astype(jnp.int32), vals.astype(dtype),
             dnums, mode=jax.lax.GatherScatterMode.CLIP)
    return out[:dst_vol]


def _exchange_ragged(send: jnp.ndarray, counts: jnp.ndarray, cap_recv: int,
                     axis: str) -> jnp.ndarray:
    """True variable-count exchange via lax.ragged_all_to_all (TPU/GPU).

    ``send`` [cap_send, B] holds this rank's outgoing runs concatenated
    in destination-rank order; returns [cap_recv, B] runs concatenated in
    source-rank order.  The MPI_Alltoallv analog (dist.h:1502-1548)."""
    r = jax.lax.axis_index(axis)
    my_send = counts[r]                                   # [n] runs to j
    input_offsets = (jnp.cumsum(my_send) - my_send).astype(jnp.int32)
    # where my chunk lands in peer j's recv concat (sources before me)
    col_pre = jnp.cumsum(counts, axis=0) - counts         # [n, n]
    output_offsets = col_pre[r].astype(jnp.int32)
    recv_sizes = counts[:, r].astype(jnp.int32)
    out0 = jnp.zeros((cap_recv, send.shape[1]), send.dtype)
    return jax.lax.ragged_all_to_all(
        send, out0, input_offsets, my_send.astype(jnp.int32),
        output_offsets, recv_sizes, axis_name=axis)


def _exchange_ragged_emulated(send: jnp.ndarray, counts: jnp.ndarray,
                              cap_recv: int, axis: str,
                              pair_cap: Optional[int] = None) -> jnp.ndarray:
    """Same contract as :func:`_exchange_ragged`, built on dense tiled
    all_to_all — the CPU stand-in (XLA:CPU has no ragged-all-to-all HLO)
    so the ragged plan layout and offset math are testable on the
    virtual mesh.  ``pair_cap`` bounds the per-pair slot capacity (the
    plan's max pair run count); without it the capacity falls back to
    cap_send, inflating the exchanged buffer ~n-fold."""
    n = counts.shape[0]
    s = send.shape[0]           # cap_send; dense slot per (peer, within)
    B = send.shape[1]
    r = jax.lax.axis_index(axis)
    my_send = counts[r]
    off = jnp.cumsum(my_send) - my_send                   # [n]
    # route each send row to dense slot (peer j, within-pair k)
    m = jnp.arange(s)
    peer = jnp.searchsorted(jnp.cumsum(my_send), m, side="right")
    peer = jnp.minimum(peer, n - 1)
    within = m - off[peer]
    valid = m < my_send.sum()
    cap = pair_cap if pair_cap is not None else s
    dense = jnp.zeros((n * cap, B), send.dtype)
    slot = jnp.where(valid, peer * cap + within, n * cap)
    dense = dense.at[slot].set(send, mode="drop")
    got = jax.lax.all_to_all(dense, axis, 0, 0, tiled=True)  # [n*cap, B]
    # compact back to source-rank-order concatenation
    my_recv = counts[:, r]
    roff = jnp.cumsum(my_recv) - my_recv
    m2 = jnp.arange(cap_recv)
    src = jnp.searchsorted(jnp.cumsum(my_recv), m2, side="right")
    src = jnp.minimum(src, n - 1)
    within2 = m2 - roff[src]
    valid2 = m2 < my_recv.sum()
    slot2 = jnp.where(valid2, src * cap + within2, 0)
    out = jnp.where(valid2[:, None], got[slot2], 0)
    return out


def _supports_ragged(mesh: Mesh) -> bool:
    plat = mesh.devices.flat[0].platform
    return plat in ("tpu", "gpu", "axon")


def _execute(plan: RedistributionPlan, local_stack, mesh: Mesh, axis: str,
             method: str):
    """Run one plan inside a shard_map over ``axis``."""
    n, B = plan.n, plan.block
    counts = jnp.asarray(plan.counts.astype(np.int32))
    copy_add = plan.copy_add
    dst_vol, dst_shape = plan.dst_vol, plan.dst_shape

    spec_data = PartitionSpec(axis, *([None] * len(plan.src_shape)))
    spec_out = PartitionSpec(axis, *([None] * len(plan.dst_shape)))
    spec_row = PartitionSpec(axis, None)
    aligned = plan.aligned

    def gath(loc, starts):
        if aligned:
            return _gather_rows(loc, starts, B, plan.src_vol)
        flat = jnp.concatenate(
            [loc.reshape(-1), jnp.zeros((B,), loc.dtype)])
        return _gather_runs(flat, starts, B)

    def scat(recv, starts, dtype):
        if aligned:
            return _scatter_rows(recv, starts, dst_vol, B, copy_add, dtype)
        return _scatter_runs(recv, starts, dst_vol, B, copy_add, dtype)

    inv_take = aligned and copy_add == "copy"

    if method == "ragged":
        cap_recv = plan.recv_starts.shape[1]
        if _supports_ragged(mesh):
            exchange = _exchange_ragged
        else:
            import functools as _ft

            exchange = _ft.partial(_exchange_ragged_emulated,
                                   pair_cap=plan.pair_cap)
        send_starts = jnp.asarray(plan.send_starts)    # [n, cap_send]
        recv_starts = jnp.asarray(
            plan.recv_inverse(dense=False) if inv_take
            else plan.recv_starts)

        def body(local, sstarts, rstarts):
            def run(loc):
                send = gath(loc, sstarts[0])
                recv = exchange(send, counts, cap_recv, axis)
                out = (_take_rows_inverse(recv, rstarts[0], loc.dtype)
                       if inv_take else scat(recv, rstarts[0], loc.dtype))
                return out.reshape((1,) + dst_shape)
            if cplx.is_carray(local):
                return cplx.cmap(lambda a: run(a[0]), local)
            return run(local[0])

        return shard_map(
            body, mesh=mesh,
            in_specs=(spec_data, spec_row, spec_row),
            out_specs=spec_out, check_vma=False,
        )(local_stack, send_starts, recv_starts)

    # method == "dense": per-pair slots padded to the max pair run count
    pack_np, unpack_np = plan.dense_idx()
    s = plan.pair_cap
    pack_idx = jnp.asarray(pack_np)        # [n, n, s]
    spec_idx = PartitionSpec(axis, None, None)

    if inv_take:
        unpack_idx = jnp.asarray(plan.recv_inverse(dense=True))  # [n, rows]
        spec_unpack = PartitionSpec(axis, None)
    else:
        unpack_idx = jnp.asarray(unpack_np)        # [n, n, s]
        spec_unpack = PartitionSpec(None, axis, None)

    def body(local, pidx, uidx):
        # local [1, *src_shape]; pidx [1, n, s];
        # uidx [n, 1, s] (scatter) or [1, rows] (inverse take)
        def run(loc):
            send = gath(loc, pidx[0].reshape(-1))          # [n*s, B]
            recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=True)
            if inv_take:
                out = _take_rows_inverse(recv, uidx[0], loc.dtype)
            else:
                out = scat(recv, uidx[:, 0, :].reshape(-1), loc.dtype)
            return out.reshape((1,) + dst_shape)
        if cplx.is_carray(local):
            return cplx.cmap(lambda a: run(a[0]), local)
        return run(local[0])

    return shard_map(
        body, mesh=mesh,
        in_specs=(spec_data, spec_idx, spec_unpack),
        out_specs=spec_out, check_vma=False,
    )(local_stack, pack_idx, unpack_idx)


def _resolve_method(method: str, mesh: Mesh, axis: str = "p") -> str:
    if method == "auto":
        # a single-rank mesh has no exchange at all: the ragged HLO is
        # pointless there (and crashed the TPU worker when fed a
        # 1-device axis) — short-circuit BEFORE honoring the env
        # override, so SBT_REDIST_METHOD=ragged stays safe on 1-rank
        # axes
        if axis in mesh.shape and mesh.shape[axis] <= 1:
            return "dense"
        env = flags.get_redist_method()
        if env != "auto":
            method = env
    if method == "auto":
        return "ragged" if _supports_ragged(mesh) else "dense"
    if method not in ("ragged", "dense"):
        raise ValueError(f"unknown redistribution method {method!r}")
    return method


def redistribute_explicit(
    local_stack,
    src: Partition,
    dst: Partition,
    mesh: Mesh,
    axis: str = "p",
    copy_add: str = "copy",
    method: str = "auto",
):
    """Move data between arbitrary partitions with explicit collectives.

    ``local_stack``: [nprocs, *src_max_shape] array (or CArray) sharded
    over ``mesh`` axis ``axis``.  Returns [nprocs, *dst_max_shape] with
    the same sharding.  ``method``: "ragged" (variable per-peer counts,
    TPU; emulated on CPU), "dense" (tiled all_to_all), or "auto".

    Reference analog: the distributed copy dispatch dist.h:3534 ->
    send_receive dist.h:1426-1573.
    """
    plan = make_plan(src, dst, copy_add)
    if axis not in mesh.shape or mesh.shape[axis] != plan.n:
        raise ValueError(
            f"redistribute_explicit: mesh axis {axis!r} must have exactly "
            f"{plan.n} devices (one per partition rank), got "
            f"{mesh.shape.get(axis) if hasattr(mesh.shape, 'get') else mesh.shape}"
        )
    method = _resolve_method(method, mesh, axis)
    if flags.get_debug_level() >= 2:
        _debug_replay(plan, src, dst, mesh, axis, method)
    return _execute(plan, local_stack, mesh, axis, method)


# ---------------------------------------------------------------------------
# SBT_DEBUG>=2: mock-index replay through the REAL collective path


def _debug_replay(plan: RedistributionPlan, src: Partition, dst: Partition,
                  mesh: Mesh, axis: str, method: str) -> None:
    """Replay the plan with global-index payloads through the actual
    shard_map/collective executor and verify every destination element
    against a plan-INDEPENDENT host oracle (the reference's ns_copy_test,
    dist.h:1919-2116, run at SB_DEBUG>=2 inside the comm layer,
    dist.h:2282-2285)."""
    dim = src.dim
    gidx = (np.arange(volume(dim), dtype=np.int64) + 1).reshape(dim)
    if volume(dim) + 1 > np.iinfo(np.int32).max:
        return  # payload would overflow the int32 carrier
    stack = pack_global(gidx.astype(np.int32), src)
    xd = jax.device_put(
        jnp.asarray(stack),
        NamedSharding(mesh, PartitionSpec(
            axis, *([None] * (stack.ndim - 1)))))
    got = np.asarray(_execute(plan, xd, mesh, axis, method))

    for j, (dfrm, dsz) in enumerate(dst.boxes):
        if volume(dsz) == 0:
            continue
        coords = np.meshgrid(*[np.arange(f, f + s) % d
                               for f, s, d in zip(dfrm, dsz, dim)],
                             indexing="ij")
        gblk = gidx[tuple(coords)]
        if plan.copy_add == "copy":
            covered = np.zeros(dsz, dtype=bool)
            for sfrm, ssz in src.boxes:
                inbox = np.ones(dsz, dtype=bool)
                for c, f, z, d in zip(coords, sfrm, ssz, dim):
                    inbox &= ((c - f) % d) < z
                covered |= inbox
            want = np.where(covered, gblk, 0)
        else:
            mult = np.zeros(dsz, dtype=np.int64)
            for sfrm, ssz in src.boxes:
                inbox = np.ones(dsz, dtype=bool)
                for c, f, z, d in zip(coords, sfrm, ssz, dim):
                    inbox &= ((c - f) % d) < z
                mult += inbox
            want = gblk * mult
        block = got[j][tuple(slice(0, s) for s in dsz)]
        if not np.array_equal(block.astype(np.int64), want):
            bad = np.argwhere(block.astype(np.int64) != want)
            raise RuntimeError(
                f"redistribution debug replay mismatch at dst rank {j}, "
                f"local coords {bad[:5].tolist()} (method={method}, "
                f"block={plan.block}) — the communication plan is "
                "corrupt (ns_copy_test analog, dist.h:1919-2116)")


# ---------------------------------------------------------------------------
# unified entry: GSPMD when expressible, explicit collectives otherwise


@functools.lru_cache(maxsize=256)
def _full_support_cached(part: Partition) -> bool:
    """has_full_support runs box-subtraction recursion — cache it so the
    GSPMD fast path stays one device_put per call (Partition is frozen
    and hashable, like the plan-cache keys)."""
    return part.has_full_support()


def redistribute_auto(x, src: Partition, dst: Partition, order: Optional[str] = None,
                 mesh: Optional[Mesh] = None, axis: str = "p",
                 copy_add: str = "copy", method: str = "auto"):
    """Move ``x`` from partition ``src`` to ``dst``, picking the path
    automatically — the reference's single ``copy()`` entry (dist.h:3534)
    that internally chooses direct assignment vs send_receive.

    Two container forms are accepted and preserved:

      * **global** array of shape ``src.dim`` (requires ``order``, the
        lattice labels): when ``dst`` is NamedSharding-expressible
        (regular grid / replicated / on-master — see
        mesh.partition_sharding) and ``copy_add == "copy"``, this is ONE
        ``jax.device_put`` and GSPMD emits the collectives.  Otherwise
        the array is staged through the stacked-local explicit path
        (host round-trip — checkpoint-class, not a hot path).
      * **stacked-local** ``[nprocs, *src_max_shape]`` sharded over
        ``mesh`` axis ``axis`` (the irregular-partition container):
        always the explicit blocked-run collective path.
    """
    if cplx.is_carray(x):
        return cplx.CArray(
            redistribute_auto(x.re, src, dst, order, mesh, axis, copy_add,
                         method),
            redistribute_auto(x.im, src, dst, order, mesh, axis, copy_add,
                         method))
    n = len(src.boxes)
    src_shape = tuple(max((b[1][i] for b in src.boxes), default=0)
                      for i in range(len(src.dim)))
    shp = tuple(x.shape)
    if len(shp) == len(src.dim) + 1 and shp[0] == n and shp[1:] == src_shape:
        if mesh is None:
            raise ValueError("stacked-local redistribution needs a mesh")
        return redistribute_explicit(x, src, dst, mesh, axis=axis,
                                     copy_add=copy_add, method=method)
    if shp != tuple(src.dim):
        raise ValueError(
            f"x has shape {shp}: neither the global form {tuple(src.dim)} "
            f"nor the stacked-local form {(n,) + src_shape}")
    if order is None:
        raise ValueError("global-array redistribution needs the label order")
    from .mesh import partition_sharding

    s_dst = partition_sharding(dst, order)
    # the GSPMD fast path reinterprets x's existing global values; it is
    # only equivalent to the explicit path when the source covers the
    # lattice — a partial src leaves uncovered destinations ZERO on the
    # explicit path (the ns_copy_test semantics) but STALE under a bare
    # device_put
    if (s_dst is not None and copy_add == "copy"
            and _full_support_cached(src)):
        return jax.device_put(x, s_dst)

    # explicit fallback: stage through the stacked-local container
    if mesh is None:
        if n > len(jax.devices()):
            raise ValueError(
                f"redistribute_auto: the partitions have {n} ranks but "
                f"only {len(jax.devices())} devices are available and no "
                "mesh was given — pass a mesh whose axis carries the "
                "rank dimension")
        mesh = Mesh(np.asarray(jax.devices()[:n]), (axis,))
    stack = pack_global(np.asarray(jax.device_get(x)), src)
    xd = jax.device_put(
        jnp.asarray(stack),
        NamedSharding(mesh, PartitionSpec(
            axis, *([None] * (stack.ndim - 1)))))
    out = redistribute_explicit(xd, src, dst, mesh, axis=axis,
                                copy_add=copy_add, method=method)
    glob = jnp.asarray(unpack_global(np.asarray(out), dst))
    return jax.device_put(glob, s_dst) if s_dst is not None else glob


# ---------------------------------------------------------------------------
# host-side stacked-local <-> global converters


def pack_global(x: np.ndarray, part: Partition) -> np.ndarray:
    """Host: global array -> stacked-padded local blocks [n, *max_shape]."""
    n = len(part.boxes)
    shape = tuple(max((b[1][i] for b in part.boxes), default=0)
                  for i in range(len(part.dim)))
    out = np.zeros((n,) + shape, dtype=x.dtype)
    for r, (frm, size) in enumerate(part.boxes):
        if volume(size) == 0:
            continue
        src = x
        for ax, (f, s) in enumerate(zip(frm, size)):
            src = np.take(src, (np.arange(f, f + s)) % part.dim[ax], axis=ax)
        out[(r,) + tuple(slice(0, s) for s in size)] = src
    return out


def unpack_global(stack: np.ndarray, part: Partition) -> np.ndarray:
    """Host: stacked local blocks -> global array (later ranks win on
    overlap)."""
    out = np.zeros(part.dim, dtype=stack.dtype)
    for r, (frm, size) in enumerate(part.boxes):
        if volume(size) == 0:
            continue
        block = stack[(r,) + tuple(slice(0, s) for s in size)]
        idx = np.ix_(*[np.arange(f, f + s) % d
                       for f, s, d in zip(frm, size, part.dim)])
        out[idx] = block
    return out
