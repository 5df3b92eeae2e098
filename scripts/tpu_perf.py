"""Where does the 2B CFG step time go? Ablation timing on hardware."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time, dataclasses
import jax, jax.numpy as jnp
import numpy as np
from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT

LATENT = (1, 16, 5, 64, 104)
base = DiTConfig(model_channels=2048, num_heads=16, num_blocks=28, use_adaln_lora=True,
                 rope_h_extrapolation_ratio=3.0, rope_w_extrapolation_ratio=3.0,
                 rope_enable_fps_modulation=False, dtype=jnp.bfloat16, remat="none")

x = jax.random.normal(jax.random.PRNGKey(0), LATENT, dtype=jnp.bfloat16)
ts = jnp.full((1,), 500.0)
ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 1024), dtype=jnp.bfloat16) * 0.02

def params_for(net):
    shapes = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x, ts, ctx))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.ndim >= 2 else s.dtype), shapes)

def timeit(net, params, iters=6):
    @jax.jit
    def many(p, a):
        def body(c, _):
            return net.apply(p, c, ts, ctx).astype(jnp.bfloat16), None
        out, _ = jax.lax.scan(body, a, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))
    float(many(params, x))
    t0 = time.perf_counter(); float(many(params, x)); t1 = time.perf_counter()
    return (t1 - t0) / iters

net = MiniTrainDIT(base)
p = params_for(net)
t_full = timeit(net, p)
print(f"full fwd: {t_full*1e3:.1f} ms")

# mlp_ratio tiny => isolate attention+elementwise
net_nomlp = MiniTrainDIT(dataclasses.replace(base, mlp_ratio=0.0625))
t_nomlp = timeit(net_nomlp, params_for(net_nomlp))
print(f"fwd mlp_ratio=1/16: {t_nomlp*1e3:.1f} ms (mlp contribution ~{(t_full-t_nomlp)*1e3:.1f} ms)")

# 1 head of same head_dim => attention tiny, linears tiny qkvo... instead:
# blocks=2 to estimate fixed overhead
net_2b = MiniTrainDIT(dataclasses.replace(base, num_blocks=2))
t_2b = timeit(net_2b, params_for(net_2b))
per_block = (t_full - t_2b) / 26
print(f"2-block fwd: {t_2b*1e3:.1f} ms -> per-block {per_block*1e3:.2f} ms, fixed {1e3*(t_2b-2*per_block):.1f} ms")
