"""Single-RHS Wilson matvec: recover or bound (VERDICT r4 item 7).

The round-2 perf table recorded "1 rhs (per rhs) 60.1 us / 13.20 TF/s"
at the bench shape — FASTER per rhs than the 12-rhs row (121.8 us),
which inverts arithmetic-intensity logic: at 1 rhs the gauge links
cannot amortize across columns, so per-rhs traffic is strictly higher.
This harness (a) sweeps every kernel variant and chunk config at
ncols=1 with long confirm-grade chains (n1=50/n2=250 — the round-4
rule after the (4,1) 69.8 TF/s short-chain artifact), (b) derives the
DMA roofline for the 1-rhs working set from the kernel's block specs,
and (c) re-times the multi-rhs path for the marginal per-rhs cost the
round-2 number most plausibly was.

Traffic model (per site, v1 plane-DMA kernel, f32, Wilson KI=KD=4,
bi=bd=3, ndir=8):
  x streams   (3*Yc+2)/Yc full reads x F=12 comps x re+im x 4 B
  links       ndir * 9 * re+im * itemsize(storage)
  y write     12 x re+im x 4 B
At Yc=2 that is 384 + 576 + 96 = 1056 B/site against 3648 flops/site
(the kernel's own cost model).  An IDEAL kernel that reads x exactly
once still moves 768 B/site = 100.7 MB -> 122.8 us / 3.17 TF/s at
nominal 819 GB/s HBM peak.  (Measured times land ON that ideal floor
and BEAT the per-plane v1 model — the model's (3Yc+2)/Yc x-multiplicity
overcounts what the DMA engine actually moves for overlapping neighbor
blocks, and read-dominated streams run at nominal peak, above the 659
GB/s read+write copy roofline.)  The round-2 13.2 TF/s figure is ~2x
PAST that speed of light for any 1-rhs schedule of this kernel family
on this chip: it was a timing artifact (short-chain class), not a
capability this toolchain lost.  Links are 55-75% of 1-rhs traffic vs
13% at 8 rhs — multi-rhs batching is the design answer, and bf16
storage halves the link term (the speed mode bench.py ships).

Run on the real chip: `python experiments/wilson_1rhs.py [--lat ...]`.

ROUND-5 RESULT (2026-08-20 toolchain, v5e 1 chip, lat 8x8x16x128;
sweep at n1=50/n2=250 then winners RE-CONFIRMED at n1=100/n2=500 —
which REFUTED a 57.8 us bf16 (1,4) sweep outlier, the same short-chain
artifact class round 4 caught at (4,1); confirmed numbers below, kernel
flop convention 3648/site with the dense-table convention 5376/site in
parens):
  f32  1 rhs:  116.8-125.0 us across (1,2)/(1,4)/(1,8) — spread is
       run noise; ~3.9-4.1 TF/s (5.6-6.0 dense).  The IDEAL 1-read
       schedule moves 768 B/site = 100.7 MB -> 122.8 us at nominal
       819 GB/s: the kernel sits AT the traffic floor.  v2-xin 3.04,
       v3-stream 3.29, XLA SoA reference 0.01 TF/s.
  bf16 1 rhs:  79.2-83.9 us, ~6.0 TF/s (8.9 dense) — 78% of its
       61.4 us nominal-peak 1-read floor (links halve to 288 B/site).
  marginal per rhs, d(time)/d(ncols) at 4->8 rhs: f32 115.0 us,
       bf16 69.3 us — neither matches the round-2 60.1 us row either.
VERDICT: bound, not regression.  The round-2 "60.1 us / 13.2 TF/s"
1-rhs row is BELOW the f32 traffic floor (122.8 us at 100% of nominal
HBM peak) — it was a timing artifact, not a capability this toolchain
lost.  f32 1-rhs is DMA-saturated (>=95% of the nominal-peak floor);
>= 10 TF/s(dense) at 1 rhs needs bytes, not scheduling: bf16 storage
(the shipped speed mode) delivers 8.9 TF/s(dense) at 79 us.  Production
solvers batch RHS — the reference's own regression table leans the
same way (tests/Makefile:100-121).  No chunk promotion: all (1,Yc)
configs agree within ~5% at confirm-grade chains.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(apply_fn, x, n1=50, n2=250):
    """Two-point latency-cancelled chained timing, median of 5
    (CLAUDE.md recipe at confirm-grade chain lengths)."""
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


def roofline(lat, n, Yc, itemsize_links, itemsize_x, bw=659e9):
    """(seconds, TF/s) lower bound for the v1 plane-DMA schedule, and
    for the ideal one-x-read schedule, at the measured copy roofline."""
    vol = 1
    for d in lat:
        vol *= d
    flops = 3648 * n * vol
    x_reads = (3 * Yc + 2) / Yc
    b_v1 = vol * (x_reads * 12 * n * 2 * itemsize_x
                  + 8 * 9 * 2 * itemsize_links + 12 * n * 2 * itemsize_x)
    b_ideal = vol * ((12 * n + 12 * n) * 2 * itemsize_x
                     + 8 * 9 * 2 * itemsize_links)
    return (b_v1 / bw, flops / (b_v1 / bw) / 1e12,
            b_ideal / bw, flops / (b_ideal / bw) / 1e12)


def main():
    from superbblas_tpu import cplx
    from superbblas_tpu.models import wilson_operator
    from superbblas_tpu.ops import stencil_pallas as sp

    jax.config.update("jax_compilation_cache_dir", "/tmp/sbt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    p = argparse.ArgumentParser()
    p.add_argument("--lat", type=int, nargs=4, default=[8, 8, 16, 128])
    args = p.parse_args()
    lat = tuple(args.lat)
    vol = 1
    for d in lat:
        vol *= d
    k = jax.random.PRNGKey(1)

    def field(ncols, dt):
        shape = (ncols, 12) + lat
        return cplx.CArray(
            jax.random.normal(k, shape, jnp.float32).astype(dt),
            jax.random.normal(jax.random.fold_in(k, 9), shape,
                              jnp.float32).astype(dt))

    results = {}
    for dt, tag, isz in ((jnp.float32, "f32", 4), (jnp.bfloat16, "bf16", 2)):
        op = wilson_operator(lat, mass=0.1, key=0, dtype=jnp.complex64,
                             layout="soa",
                             storage_dtype=(None if dt == jnp.float32
                                            else dt))
        blocks, kron, offs = op.blocks, op.kron, op.offsets
        flops1 = 3648 * vol

        print(f"-- {tag} 1 rhs (flops {flops1/1e9:.2f} GF) --", flush=True)
        for Yc in (1, 2, 4, 8):
            t_v1, tf_v1, t_id, tf_id = roofline(lat, 1, Yc, isz, isz)
            print(f"   roofline v1 Yc={Yc}: {t_v1*1e6:7.1f} us "
                  f"{tf_v1:5.2f} TF/s   (ideal 1-read: {t_id*1e6:.1f} us "
                  f"{tf_id:.2f} TF/s)", flush=True)

        x1 = field(1, dt)
        want = None

        def run(name, fn, x=x1, flops=flops1):
            nonlocal want
            try:
                y = jax.block_until_ready(fn(x))
            except Exception as e:
                print(f"  {tag} {name:24s}: SKIP "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                return None
            if x is x1:
                if want is None:
                    want = y
                else:
                    err = float(jnp.max(jnp.abs(
                        y.re.astype(jnp.float32)
                        - want.re.astype(jnp.float32))))
                    scale = float(jnp.max(jnp.abs(
                        want.re.astype(jnp.float32)))) or 1.0
                    if err / scale > (1e-4 if dt == jnp.float32 else 2e-2):
                        print(f"  {tag} {name:24s}: WRONG rel-err "
                              f"{err / scale:.2e}", flush=True)
                        return None
            dtm = timeit(fn, x)
            tf = flops / dtm / 1e12
            results[(tag, name)] = (dtm, tf)
            print(f"  {tag} {name:24s}: {dtm * 1e6:8.1f} us  "
                  f"{tf:6.2f} TF/s", flush=True)
            return dtm

        run("v1 auto", lambda v: sp.stencil_matvec_soa(
            blocks, kron, v, offs, 3, 3))
        for Yc in (1, 2, 4, 8):
            run(f"v1 (1,{Yc})",
                lambda v, Yc=Yc: sp.stencil_matvec_soa(
                    blocks, kron, v, offs, 3, 3, chunks=(1, Yc)))
        run("v2 xin", lambda v: sp.stencil_matvec_soa_xin(
            blocks, kron, v, offs, 3, 3))
        run("v3 stream", lambda v: sp.stencil_matvec_soa_stream(
            blocks, kron, v, offs, 3, 3, nc=1))
        run("xla soa reference", lambda v: sp.stencil_matvec_soa_reference(
            blocks, kron, v, offs, 3, 3))

        # marginal per-rhs cost: d(time)/d(ncols) between 4 and 8 rhs —
        # the quantity a multi-RHS solver actually pays per extra column
        want = None
        x8, x4 = field(8, dt), field(4, dt)
        t8 = run("v1 auto 8 rhs", lambda v: sp.stencil_matvec_soa(
            blocks, kron, v, offs, 3, 3), x=x8, flops=8 * flops1)
        want = None
        t4 = run("v1 auto 4 rhs", lambda v: sp.stencil_matvec_soa(
            blocks, kron, v, offs, 3, 3), x=x4, flops=4 * flops1)
        if t8 and t4:
            marg = (t8 - t4) / 4
            print(f"  {tag} marginal per-rhs (8-4)/4: {marg*1e6:8.1f} us  "
                  f"{flops1/marg/1e12:6.2f} TF/s-equiv", flush=True)

    best1 = {}
    for (tag, name), (dtm, tf) in results.items():
        if "rhs" in name:
            continue
        if tag not in best1 or tf > best1[tag][2]:
            best1[tag] = (name, dtm, tf)
    for tag, (name, dtm, tf) in best1.items():
        print(f"BEST {tag} 1-rhs: {name} at {dtm*1e6:.1f} us "
              f"{tf:.2f} TF/s", flush=True)


if __name__ == "__main__":
    main()
