"""Ours vs stock pallas flash attention + bench rerun."""
import time
import jax, jax.numpy as jnp
import numpy as np
from cosmos_predict2_tpu.ops.flash_attention import flash_attention

S, H, D = 8320, 16, 128
q = jax.random.normal(jax.random.PRNGKey(0), (1, S, H, D), dtype=jnp.bfloat16)
qt = q.transpose(0, 2, 1, 3)  # BHSD for stock
flops = 4 * S * S * D * H
ITERS = 20

def bench(fn, x):
    @jax.jit
    def many(a):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, a, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))
    float(many(x))
    t0 = time.perf_counter(); float(many(x)); t1 = time.perf_counter()
    return (t1 - t0) / ITERS

t_ours = bench(lambda a: flash_attention(a, a, a), q)
print(f"ours 1024/1024 (BSHD): {t_ours*1e3:.2f} ms {flops/t_ours/1e12:.1f} TF/s ({flops/t_ours/197e12*100:.0f}%)")

try:
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as stock
    t_stock = bench(lambda a: stock(a, a, a, causal=False), qt)
    print(f"stock jax kernel (BHSD): {t_stock*1e3:.2f} ms {flops/t_stock/1e12:.1f} TF/s ({flops/t_stock/197e12*100:.0f}%)")
except Exception as e:
    print("stock failed:", str(e)[:150])

# XLA-native attention for reference
def xla_attn(a):
    return jax.nn.dot_product_attention(a, a, a)
try:
    t_xla = bench(xla_attn, q)
    print(f"jax.nn.dot_product_attention: {t_xla*1e3:.2f} ms {flops/t_xla/1e12:.1f} TF/s")
except Exception as e:
    print("xla attn failed:", str(e)[:120])
