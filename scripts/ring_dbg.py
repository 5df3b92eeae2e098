import sys, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import jax.numpy as jnp, numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from cosmos_predict2_tpu.parallel.ring_attention import ring_attention
mesh = Mesh(np.array(jax.devices()[:4]), ("cp",))
spec = jax.NamedSharding(mesh, P(None, "cp", None, None))
q = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 4, 8))
with jax.set_mesh(mesh):
    qs = jax.device_put(q, spec)
    try:
        out = jax.jit(lambda a: ring_attention(a, a, a))(qs)
        print("ok", out.shape)
    except TypeError as e:
        print(str(e)[:2000])
