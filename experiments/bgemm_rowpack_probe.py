"""Row-packed batched GEMM for the LARGE-K coarse shape:
[nc, ndir*nc] @ [ndir*nc, ncols] per site, nc=32, K=288, V=4096.
Packs S=4 sites into a [128, S*288] block-diagonal LHS; columns of the
diagonal blocks land at offsets s*288 (NOT 128-aligned) — the Mosaic
feasibility question this probe answers."""
import sys, time, statistics, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, I, K, N = 4096, 32, 288, 32
S = 128 // I          # 4 sites per tile


def kernel(b_ref, x_ref, o_ref, d_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        d_ref[:] = jnp.zeros_like(d_ref)

    for s in range(S):
        d_ref[s * I:(s + 1) * I, s * K:(s + 1) * K] = b_ref[s]
    x = x_ref[:].reshape(S * K, N)
    o_ref[:] = jnp.dot(d_ref[:], x, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST
                       ).reshape(S, I, N)


@jax.jit
def rowpack(b, x):
    return pl.pallas_call(
        kernel,
        grid=(V // S,),
        in_specs=[pl.BlockSpec((S, I, K), lambda g: (g, 0, 0)),
                  pl.BlockSpec((S, K, N), lambda g: (g, 0, 0))],
        out_specs=pl.BlockSpec((S, I, N), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((V, I, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S * I, S * K), jnp.float32)],
    )(b, x)


@jax.jit
def xla(b, x):
    return jax.lax.dot_general(b, x, (((2,), (1,)), ((0,), (0,))),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def time_chained(f, b, x, n1=20, n2=100):
    res = {}
    for n in (n1, n2):
        def chained(bb, xx):
            def body(c, _):
                y = f(bb, c[:, :I * K // I].reshape(V, K, N)) if False else f(bb, c)
                return c + 1e-6 * jnp.sum(y), ()
            c, _ = jax.lax.scan(body, xx, None, length=n)
            return jnp.sum(c)
        jf = jax.jit(chained)
        float(jf(b, x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); float(jf(b, x)); ts.append(time.perf_counter() - t0)
        res[n] = statistics.median(ts)
    return (res[n2] - res[n1]) / (n2 - n1)


rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal((V, I, K)) / np.sqrt(K), jnp.float32)
x = jnp.asarray(rng.standard_normal((V, K, N)), jnp.float32)
flops = 2 * V * I * K * N
print("flops/call:", flops / 1e9, "GF", flush=True)
try:
    err = float(jnp.max(jnp.abs(rowpack(b, x) - xla(b, x))))
    print("rowpack compiles; err vs xla:", err, flush=True)
    dt = time_chained(rowpack, b, x)
    print(f"rowpack: {flops/dt/1e12:.2f} TF/s ({dt*1e6:.0f} us)", flush=True)
except Exception as e:
    print("rowpack FAIL:", str(e)[:300], flush=True)
dt = time_chained(xla, b, x)
print(f"xla    : {flops/dt/1e12:.2f} TF/s ({dt*1e6:.0f} us)", flush=True)
