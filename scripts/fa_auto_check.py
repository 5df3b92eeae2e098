import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from cosmos_predict2_tpu.ops import flash_attention as fa

# auto-pick sanity on host
for sq, skv in [(8320, 8320), (8192, 8192), (512, 512), (300, 300), (84480, 84480), (8320, 512)]:
    print(sq, skv, "->", fa._auto_blocks(sq, skv, None, None))

# numerics + perf on TPU at bench shape
B, H, S, D = 1, 16, 8320, 128
q, k, v = (jax.random.normal(kk, (B, H, S, D), dtype=jnp.bfloat16) for kk in jax.random.split(jax.random.PRNGKey(0), 3))
out = jax.jit(fa._flash_bhsd)(q, k, v)
qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) / np.sqrt(D)
ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), vf)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
print("max err vs fp32 ref:", err)

# bwd numerics (small seq, also exercises auto blocks in _bwd)
S2 = 1664
q2, k2, v2 = (t[:, :2, :S2] for t in (q, k, v))
def loss_flash(q, k, v): return jnp.sum(fa._flash_bhsd(q, k, v) * 0.001)
def loss_ref(q, k, v):
    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) / np.sqrt(D)
    return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), vf) * 0.001)
g1 = jax.jit(jax.grad(loss_flash, argnums=(0,1,2)))(q2, k2, v2)
g2 = jax.jit(jax.grad(loss_ref, argnums=(0,1,2)))(q2, k2, v2)
for a, b, n in zip(g1, g2, "qkv"):
    print("d"+n, "max err:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b))))

def timeit(f, *args, iters=20):
    def loop(*a):
        def body(i, acc):
            o = f(a[0] + acc * 0, *a[1:])
            return jnp.float32(jnp.sum(o[0, 0, 0, :2]))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    g = jax.jit(loop); float(g(*args))
    t0 = time.perf_counter(); float(g(*args)); t1 = time.perf_counter()
    return (t1 - t0) / iters

dt = timeit(jax.jit(fa._flash_bhsd), q, k, v)
print(f"auto blocks fwd: {dt*1e3:.3f} ms  {4*B*H*S*S*D/dt/1e12:.2f} TF/s")
