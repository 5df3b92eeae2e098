import sys, time
sys.path.insert(0, "/root/repo")
import dataclasses
import jax, jax.numpy as jnp
from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT
from cosmos_predict2_tpu.ops.flash_attention import _flash_bhsd

def timeit(g, *args, iters=8):
    float(jnp.sum(g(*args)))
    t0 = time.perf_counter()
    for _ in range(iters): r = g(*args)
    float(jnp.sum(r)); t1 = time.perf_counter()
    return (t1 - t0) / iters

base = DiTConfig(model_channels=2048, num_heads=16, num_blocks=28, use_adaln_lora=True,
                 rope_enable_fps_modulation=False, dtype=jnp.bfloat16, remat="none")
B, C, T, H, W = 2, 16, 5, 64, 104   # batched-CFG bench shape, seq 8320
x = jax.random.normal(jax.random.PRNGKey(0), (B, C, T, H, W), dtype=jnp.bfloat16)
ts = jnp.full((B,), 500.0, dtype=jnp.float32)
ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 512, 1024), dtype=jnp.bfloat16) * 0.05

net = MiniTrainDIT(base)
params = net.init(jax.random.PRNGKey(2), x, ts, ctx)
params = jax.tree.map(lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params)
f = jax.jit(lambda p, a: net.apply(p, a, ts, ctx))
t_total = timeit(f, params, x)
print(f"full fwd (B=2): {t_total*1e3:8.2f} ms")

# isolated self-attention kernel at model shape
q = jax.random.normal(jax.random.PRNGKey(3), (B, 16, 8320, 128), dtype=jnp.bfloat16)
ka = jax.jit(_flash_bhsd)
t_attn = timeit(ka, q, q, q)
print(f"self-attn kernel x28: {t_attn*28*1e3:8.2f} ms  ({t_attn*1e3:.3f}/block)")

# reference-attention backend for comparison
net_ref = MiniTrainDIT(dataclasses.replace(base, atten_backend="reference"))
f2 = jax.jit(lambda p, a: net_ref.apply(p, a, ts, ctx))
t_ref = timeit(f2, params, x)
print(f"full fwd (XLA attn): {t_ref*1e3:8.2f} ms")
