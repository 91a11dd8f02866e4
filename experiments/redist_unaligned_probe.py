import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
jax.config.update("jax_compilation_cache_dir", "/tmp/sbt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from superbblas_tpu.parallel import Partition
from superbblas_tpu.parallel.redistribute import make_plan, _execute, _resolve_method, RedistributionPlan
from bench import time_chained

dim = (2048, 8192)
# UNALIGNED toroidal shift: gcd degenerates to 1 for the runs path
src = Partition(dim=dim, boxes=(((0, 0), dim),))
dst = Partition(dim=dim, boxes=(((1023, 37), dim),))
mesh = Mesh(np.asarray(jax.devices()[:1]), ("p",))
method = _resolve_method("auto", mesh, "p")
x = jax.random.normal(jax.random.PRNGKey(0), (1,) + dim, jnp.float32)
x = jax.device_put(x, NamedSharding(mesh, P("p", None, None)))

for pack in ("boxes",):
    plan = RedistributionPlan(src, dst, "copy", pack=pack)
    print(pack, "block:", plan.block, "pieces:", sum(len(v) for v in plan.pair_pieces.values()))
    def make_fn(n):
        def chained(v):
            def body(c, _):
                return _execute(plan, c, mesh, "p", method) + 1e-6, ()
            c, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.sum(c)
        jitted = jax.jit(chained)
        return lambda: jitted(x)
    dt = time_chained(make_fn, n1=20, n2=100)
    nbytes = 2 * x.size * 4
    print(json.dumps({"pack": pack, "GB/s": round(nbytes / dt / 1e9, 1)}))
