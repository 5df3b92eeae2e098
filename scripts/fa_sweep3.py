import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from functools import partial
from cosmos_predict2_tpu.ops.flash_attention import _flash_bhsd

B, H, S, D = 2, 16, 8320, 128
q, k, v = (jax.random.normal(kk, (B, H, S, D), dtype=jnp.bfloat16) for kk in jax.random.split(jax.random.PRNGKey(0), 3))
flops = 4 * B * H * S * S * D

def bench(bq, bkv, iters=10):
    f = jax.jit(partial(_flash_bhsd, block_q=bq, block_kv=bkv))
    def loop(q, k, v):
        def body(i, acc):
            o = f(q + acc.astype(q.dtype) * 0, k, v)
            return jnp.float32(jnp.sum(o[0, 0, 0, :2]))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    g = jax.jit(loop); float(g(q, k, v))
    t0 = time.perf_counter(); float(g(q, k, v)); t1 = time.perf_counter()
    dt = (t1 - t0) / iters
    print(f"bq={bq:5} bkv={bkv:5}  {dt*1e3:7.3f} ms  {flops/dt/1e12:7.2f} TF/s", flush=True)

for bq, bkv in [(None, None), (1664, 640), (640, 1664), (512, 1664), (768, 1664), (896, 1664), (640, 832)]:
    try: bench(bq, bkv)
    except Exception as e: print(bq, bkv, "FAIL", str(e)[:100], flush=True)
