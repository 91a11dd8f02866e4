import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from superbblas_tpu.parallel import Partition
from superbblas_tpu.parallel.redistribute import RedistributionPlan, _execute, _resolve_method
dim = (2048, 8192)
src = Partition(dim=dim, boxes=(((0, 0), dim),))
dst = Partition(dim=dim, boxes=(((1023, 37), dim),))
mesh = Mesh(np.asarray(jax.devices()[:1]), ("p",))
method = _resolve_method("auto", mesh, "p")
print("method:", method, flush=True)
plan = RedistributionPlan(src, dst, "copy", pack="boxes")
print("plan built", flush=True)
x = jax.device_put(jnp.ones((1,) + dim, jnp.float32), NamedSharding(mesh, P("p", None, None)))
print("x placed", flush=True)
t0 = time.perf_counter()
out = _execute(plan, x, mesh, "p", method)
out.block_until_ready()
print("first exec", time.perf_counter() - t0, flush=True)
t0 = time.perf_counter()
for _ in range(5):
    out = _execute(plan, out, mesh, "p", method)
out.block_until_ready()
print("5 eager execs", time.perf_counter() - t0, flush=True)
