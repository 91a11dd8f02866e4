"""Headline benchmark: dense label-driven contraction GFLOP/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); the driver-provided
target is >= 60% MXU utilization on dense contractions.  ``vs_baseline``
is therefore achieved-GFLOP/s divided by that target (0.6 x peak bf16
FLOP/s of the local chip): >= 1.0 means the target is met.

Methodology: the device sits behind a high-latency tunnel in this
environment (dispatch+fetch ~25 ms), so each measurement chains the
workload N times inside one jitted lax.scan, fetches a scalar, and uses
two-point timing ((t(N2)-t(N1)) / (N2-N1)) to cancel the fixed latency.

--all additionally prints:
  bsr_wilson_matvec_gflops        SoA/Pallas Wilson matvec (dense-flop
                                  model; vs_baseline = model GB/s / 800)
  permute_copy_bandwidth          Pallas tiled label-reversal transpose
  eo_packed_hopping_gflops        packed even-odd hopping (vs_baseline =
                                  rate relative to the full matvec's
                                  8.5 TF/s reference point)
  shift_redistribution_bandwidth  toroidal shift (halo-class move)
"""

import json
import sys
import time


# Per-chip dense peak (bf16 MAC) FLOP/s.
PEAKS = {
    "v5 lite": 197e12,   # TPU v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6": 918e12,
    "cpu": 1e11,
}


def chip_peak(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, val in PEAKS.items():
        if key in kind:
            return val
    return 197e12


def time_chained(make_fn, n1=100, n2=500):
    """Two-point latency-cancelled timing of a chained workload.

    ``make_fn(n)`` must return a jitted nullary-ish callable running the
    step n times and returning a scalar.  The tunnel between host and
    device adds ~25 ms of per-call jitter, so (a) the chains are long
    enough that the n2-n1 signal is several times the jitter and (b) the
    estimate uses the median of repeated runs (min-of-noisy subtraction
    can even exceed hardware peak).
    """
    import statistics

    results = {}
    for n in (n1, n2):
        fn = make_fn(n)
        float(fn())  # compile + warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn())
            times.append(time.perf_counter() - t0)
        results[n] = statistics.median(times)
    return (results[n2] - results[n1]) / (n2 - n1)


def bench_contraction():
    import jax
    import jax.numpy as jnp

    from superbblas_tpu import local_contraction

    T, A, B, C = 8, 1024, 1024, 1024
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (T, A, B), dtype=jnp.bfloat16)
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (T, A, C),
                           dtype=jnp.bfloat16)

    def make_fn(n):
        def chained(a, b):
            def body(c, _):
                out = local_contraction(
                    1.0, c, "tab", False, b, "tac", False, 0.0, None, "tbc")
                return out.astype(a.dtype), ()
            c, _ = jax.lax.scan(body, a, None, length=n)
            return jnp.sum(c.astype(jnp.float32))
        jitted = jax.jit(chained)
        return lambda: jitted(x0, x1)

    dt = time_chained(make_fn, n1=100, n2=500)
    flops = 2 * T * A * B * C
    return flops / dt / 1e9, dt


def bench_bsr(lat=(8, 8, 16, 128), ncols=8):
    """Wilson matvec in the SoA/Pallas hot path (ops/stencil_pallas.py)."""
    import jax
    import jax.numpy as jnp

    from superbblas_tpu import cplx
    from superbblas_tpu.models import apply_wilson, wilson_operator

    op = wilson_operator(lat, mass=0.1, key=0, dtype=jnp.complex64,
                         layout="soa")
    k = jax.random.PRNGKey(1)
    shape = (ncols, 12) + lat
    x = cplx.CArray(
        jax.random.normal(k, shape, jnp.float32),
        jax.random.normal(jax.random.fold_in(k, 9), shape, jnp.float32),
    )

    def make_fn(n):
        def chained(xv):
            def body(c, _):
                return apply_wilson(op, c), ()
            c, _ = jax.lax.scan(body, xv, None, length=n)
            return jnp.sum(jnp.abs(c.re))
        jitted = jax.jit(chained)
        return lambda: jitted(x)

    n1, n2 = (40, 240) if ncols <= 4 else (20, 120)
    dt = time_chained(make_fn, n1=n1, n2=n2)
    flops = op.flops_per_matvec(ncols, complex_dtype=True)
    memops = op.memops_per_matvec(ncols, itemsize=8)
    return flops / dt / 1e9, memops / dt / 1e9, dt


def bench_copy(shape=(128, 64, 64, 128)):
    import jax
    import jax.numpy as jnp

    from superbblas_tpu import local_permute
    from superbblas_tpu.ops.permute_pallas import (
        pallas_permute,
        permute_eligible,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype=jnp.float32)
    use_pallas = (jax.devices()[0].platform in ("tpu", "axon")
                  and permute_eligible(shape, (3, 2, 1, 0), jnp.float32))

    def make_fn(n):
        def chained(v):
            def body(c, _):
                # reversal permute is self-inverse; +1 defeats
                # double-transpose simplification across iterations
                t = (pallas_permute(c, (3, 2, 1, 0)) if use_pallas
                     else local_permute(c, "xyzt", "tzyx"))
                return t + 1.0, ()
            c, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.sum(c)
        jitted = jax.jit(chained)
        return lambda: jitted(x)

    dt = time_chained(make_fn, n1=50, n2=250)
    nbytes = 2 * x.size * 4   # one read + one write per step
    return nbytes / dt / 1e9, dt


def bench_eo_packed(lat=(8, 8, 16, 128), ncols=8):
    """Packed-checkerboard hopping through the Pallas parity-select path
    (the production even-odd solver's matvec)."""
    import jax
    import jax.numpy as jnp

    from superbblas_tpu import cplx
    from superbblas_tpu.models import wilson_operator
    from superbblas_tpu.models.eo_packed import (
        apply_hopping_packed_soa,
        cb_pack_soa,
        hopping_packed_soa,
    )

    op = wilson_operator(lat, mass=0.1, key=0, dtype=jnp.complex64,
                         layout="soa")
    hop_o = hopping_packed_soa(op, 1)
    k = jax.random.PRNGKey(1)
    shape = (ncols, 12) + lat
    x = cb_pack_soa(cplx.CArray(
        jax.random.normal(k, shape, jnp.float32),
        jax.random.normal(jax.random.fold_in(k, 9), shape, jnp.float32)), 0)

    def make_fn(n):
        def chained(xv):
            def body(c, _):
                return apply_hopping_packed_soa(hop_o, c, 1), ()
            c, _ = jax.lax.scan(body, xv, None, length=n)
            return jnp.sum(jnp.abs(c.re))
        jitted = jax.jit(chained)
        return lambda: jitted(x)

    dt = time_chained(make_fn, n1=20, n2=120)
    flops = hop_o.flops_per_matvec(ncols, complex_dtype=True)
    return flops / dt / 1e9, dt


def bench_shift(shape=(128, 64, 64, 128)):
    """Toroidal tensor shift (halo-exchange analog on one chip): the
    reference's tests/dist.cpp:303-330 shift benchmark; under a sharded
    mesh the same roll compiles to neighbor collective permutes."""
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype=jnp.float32)

    def make_fn(n):
        def chained(v):
            def body(c, _):
                return jnp.roll(c, 1, axis=0) + 1.0, ()
            c, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.sum(c)
        jitted = jax.jit(chained)
        return lambda: jitted(x)

    dt = time_chained(make_fn, n1=50, n2=250)
    nbytes = 2 * x.size * 4
    return nbytes / dt / 1e9, dt


def main():
    import jax

    dev = jax.devices()[0]
    gflops, dt = bench_contraction()
    target = 0.6 * chip_peak(dev) / 1e9
    print(json.dumps({
        "metric": "dense_contraction_gflops",
        "value": round(gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / target, 4),
    }))
    if "--all" in sys.argv:
        bsr_gf, bsr_gb, bsr_dt = bench_bsr()
        print(json.dumps({
            "metric": "bsr_wilson_matvec_gflops",
            "value": round(bsr_gf, 1),
            "unit": "GFLOP/s",
            "vs_baseline": round(bsr_gb / 800.0, 4),  # vs ~800 GB/s HBM
        }))
        cp_gb, cp_dt = bench_copy()
        print(json.dumps({
            "metric": "permute_copy_bandwidth",
            "value": round(cp_gb, 1),
            "unit": "GB/s",
            "vs_baseline": round(cp_gb / 800.0, 4),
        }))
        eo_gf, eo_dt = bench_eo_packed()
        print(json.dumps({
            "metric": "eo_packed_hopping_gflops",
            "value": round(eo_gf, 1),
            "unit": "GFLOP/s",
            "vs_baseline": round(eo_gf / 1000.0 / 8.5, 4),  # vs full matvec
        }))
        sh_gb, sh_dt = bench_shift()
        print(json.dumps({
            "metric": "shift_redistribution_bandwidth",
            "value": round(sh_gb, 1),
            "unit": "GB/s",
            "vs_baseline": round(sh_gb / 800.0, 4),
        }))


if __name__ == "__main__":
    main()
