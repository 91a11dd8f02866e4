"""Can a Pallas tiled transpose beat XLA's permute on TPU?

Workload: the bench permute — full label reversal xyzt -> tzyx of a
64^4 f32 tensor (64 MiB moved twice).  XLA's one-pass transpose lands
well under HBM roofline here; these variants test whether explicit
tiling does better.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def timeit(op, x, n1=10, n2=60):
    """Latency-cancelled: chain the op inside one jitted scan (the op must
    be an involution up to value changes; we feed its output back)."""
    import functools

    res = {}
    for n in (n1, n2):
        @jax.jit
        def chained(v, n=n):
            def body(c, _):
                return op(c) + 1.0, ()   # one op per iteration; the
                # while-loop boundary stops XLA cancelling T with T^-1
            c, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.sum(c)
        float(chained(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(x))
            best = min(best, time.perf_counter() - t0)
        res[n] = best
    return (res[n2] - res[n1]) / (n2 - n1)


def gbps(nbytes, dt):
    return nbytes / dt / 1e9


def main():
    shape = (64, 64, 64, 64)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype=jnp.float32)
    nbytes = 2 * x.size * 4

    # XLA baseline
    xla = jax.jit(lambda v: jnp.transpose(v, (3, 2, 1, 0)))
    dt = timeit(xla, x)
    print(f"XLA transpose        : {dt*1e3:8.3f} ms  {gbps(nbytes, dt):7.1f} GB/s")
    ref = xla(x)

    # Variants: block in (X, Yb, Zb, T) -> out (T, Zb, Yb, X); the last
    # two block dims must be (8k, 128k) or full, so X and T stay whole.
    X, Y, Z, T = shape

    def kern(xr, yr, *, YB, ZB):
        # per-(y,z) 2D transposes: Mosaic crashes on 4D transpose ops
        for j in range(YB):
            for k in range(ZB):
                yr[:, k, j, :] = xr[:, j, k, :].T

    import functools
    for YB, ZB in ((8, 8), (16, 8), (8, 16), (16, 16), (32, 8), (4, 8), (2, 8), (1, 8)):
        v = pl.pallas_call(
            functools.partial(kern, YB=YB, ZB=ZB),
            grid=(Y // YB, Z // ZB),
            in_specs=[pl.BlockSpec((X, YB, ZB, T), lambda y, z: (0, y, z, 0))],
            out_specs=pl.BlockSpec((T, ZB, YB, X), lambda y, z: (0, z, y, 0)),
            out_shape=jax.ShapeDtypeStruct((T, Z, Y, X), x.dtype),
        )
        vj = jax.jit(v)
        try:
            ok = jnp.array_equal(vj(x), ref)
        except Exception as e:
            print(f"pallas ({YB},{ZB}): FAILED {type(e).__name__}: {str(e)[:100]}")
            continue
        dt = timeit(vj, x)
        print(f"pallas YB={YB:2d} ZB={ZB:2d} ok={bool(ok)}: {dt*1e3:8.3f} ms  {gbps(nbytes, dt):7.1f} GB/s")

    # Variant 4: two-pass through a lane-preserving reshape:
    #   xyzt -> (zy) x t -> transpose to x (zy) t? ... single jnp comparison:
    # flatten (x,y,z) major and transpose 2D [(xyz), t] -> [t, (xyz)] then
    # reverse-order the major dims with a second cheap transpose.
    def twopass(v):
        a = jnp.transpose(v.reshape(X * Y * Z, T))      # [T, XYZ]
        a = a.reshape(T, X, Y, Z)
        return jnp.transpose(a, (0, 3, 2, 1))           # minor stays Z->... no
    tp = jax.jit(twopass)
    assert jnp.array_equal(tp(x), ref)
    dt = timeit(tp, x)
    print(f"XLA two-pass         : {dt*1e3:8.3f} ms  {gbps(1.5*nbytes, dt):7.1f} GB/s(eff {gbps(nbytes, dt):7.1f})")

    # Plain copy roofline for context
    cp = jax.jit(lambda v: v + 1.0)
    dt = timeit(cp, x)
    print(f"copy (v+1) roofline  : {dt*1e3:8.3f} ms  {gbps(nbytes, dt):7.1f} GB/s")


if __name__ == "__main__":
    main()
