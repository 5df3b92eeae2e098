import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from cosmos_predict2_tpu.ops.flash_attention_jvp import flash_attention_fwdmode, reference_attention_jvp

B, S, H, D = 1, 8320, 16, 128
keys = jax.random.split(jax.random.PRNGKey(0), 6)
q, k, v, dq, dk, dv = (jax.random.normal(kk, (B, S, H, D), dtype=jnp.bfloat16) for kk in keys)

f = jax.jit(lambda q, k, v, dq, dk, dv: jax.jvp(flash_attention_fwdmode, (q, k, v), (dq, dk, dv)))
o, do = f(q, k, v, dq, dk, dv)
# numerics on a slice vs fp32 reference
qs, ks, vs, dqs, dks, dvs = (t[:, :1664, :2].astype(jnp.float32) for t in (q, k, v, dq, dk, dv))
wo, wdo = reference_attention_jvp(qs, ks, vs, dqs, dks, dvs)
go, gdo = jax.jit(lambda *a: jax.jvp(flash_attention_fwdmode, a[:3], a[3:]))(qs, ks, vs, dqs, dks, dvs)
print("o err", float(jnp.max(jnp.abs(go - wo))), "do err", float(jnp.max(jnp.abs(gdo - wdo))))

def loop(q, k, v, dq, dk, dv):
    def body(i, acc):
        o, do = f(q + acc.astype(q.dtype) * 0, k, v, dq, dk, dv)
        return jnp.float32(jnp.sum(do[0, 0, 0, :2]))
    return jax.lax.fori_loop(0, 20, body, jnp.float32(0.0))
g = jax.jit(loop); float(g(q, k, v, dq, dk, dv))
t0 = time.perf_counter(); float(g(q, k, v, dq, dk, dv)); t1 = time.perf_counter()
dt = (t1 - t0) / 20
print(f"jvp fused: {dt*1e3:.3f} ms  ({10*B*H*S*S*D/dt/1e12:.1f} TF/s effective)")
