import sys, time
sys.path.insert(0, "/root/repo")
import dataclasses
import jax, jax.numpy as jnp
from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT

base = DiTConfig(model_channels=2048, num_heads=16, num_blocks=28, use_adaln_lora=True,
                 rope_enable_fps_modulation=False, dtype=jnp.bfloat16)
B, C, T, H, W = 1, 16, 5, 48, 80   # seq 4800
x = jax.random.normal(jax.random.PRNGKey(0), (B, C, T, H, W), dtype=jnp.bfloat16)
ts = jnp.full((B,), 500.0, dtype=jnp.float32)
ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 512, 1024), dtype=jnp.bfloat16) * 0.05

for mode in ("selective", "block"):
    net = MiniTrainDIT(dataclasses.replace(base, remat=mode))
    params = net.init(jax.random.PRNGKey(2), x, ts, ctx)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params)
    def loss(p):
        return jnp.mean(jnp.square(net.apply(p, x, ts, ctx).astype(jnp.float32)))
    g = jax.jit(jax.grad(loss))
    r = g(params); jax.block_until_ready(r)
    def loop(p):
        def body(i, acc):
            gr = g(p)
            return acc + jnp.float32(jax.tree.leaves(gr)[0].astype(jnp.float32).sum())
        return jax.lax.fori_loop(0, 5, body, jnp.float32(0.0))
    lp = jax.jit(loop); float(lp(params))
    t0 = time.perf_counter(); float(lp(params)); t1 = time.perf_counter()
    print(f"remat={mode:10s} fwd+bwd: {(t1-t0)/5*1e3:.1f} ms", flush=True)
