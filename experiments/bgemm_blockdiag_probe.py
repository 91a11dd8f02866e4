"""Real-TPU probe v2: chained-scan timing (tunnel-latency cancelled)."""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from superbblas_tpu.ops.batched_gemm_pallas import batched_small_gemm

dev = jax.devices()[0]
print("device:", dev.device_kind, flush=True)


def time_chained(make_fn, n1=50, n2=250):
    res = {}
    for n in (n1, n2):
        fn = make_fn(n)
        float(fn())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); float(fn()); ts.append(time.perf_counter() - t0)
        res[n] = statistics.median(ts)
    return (res[n2] - res[n1]) / (n2 - n1)


rng = np.random.default_rng(0)
for (I, N) in [(12, 32), (12, 128), (24, 128), (32, 128)]:
    V = 8192
    J = I
    b = jnp.asarray(rng.standard_normal((V, I, J)) / np.sqrt(I), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((V, J, N)), jnp.float32)

    def make(f):
        def mk(n):
            def chained(bb, xx):
                def body(c, _):
                    y = f(bb, c)
                    return y + 1e-6, ()   # defeat simplification
                c, _ = jax.lax.scan(body, xx, None, length=n)
                return jnp.sum(c)
            jf = jax.jit(chained)
            return lambda: jf(b, x0)
        return mk

    flops = 2 * V * I * J * N
    for name, f in [("pallas", lambda bb, xx: batched_small_gemm(bb, xx)),
                    ("xla", lambda bb, xx: jax.lax.dot_general(
                        bb, xx, (((2,), (1,)), ((0,), (0,))),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32))]:
        try:
            dt = time_chained(make(f))
            print(f"I=J={I:3d} N={N:3d} {name:6s}: {flops/dt/1e12:6.2f} TF/s "
                  f"({dt*1e6:.0f} us/call)", flush=True)
        except Exception as e:
            print(f"I=J={I:3d} N={N:3d} {name}: FAIL {str(e)[:80]}", flush=True)
