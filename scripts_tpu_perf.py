"""exp2 kernel: correctness + perf on hardware, incl. bwd and causal."""
import time
import jax, jax.numpy as jnp
import numpy as np
from cosmos_predict2_tpu.ops.flash_attention import flash_attention
from cosmos_predict2_tpu.ops.attention import reference_attention

S, H, D = 8320, 16, 128
q = jax.random.normal(jax.random.PRNGKey(0), (1, S, H, D), dtype=jnp.bfloat16)
flops = 4 * S * S * D * H
ITERS = 20

# correctness (small)
qs = q[:, :2048, :4]
out = flash_attention(qs, qs, qs)
ref = reference_attention(qs, qs, qs)
print("fwd err:", float(jnp.max(jnp.abs(out.astype(jnp.float32)-ref.astype(jnp.float32)))))
gf = jax.grad(lambda a: jnp.sum(flash_attention(a, a, a).astype(jnp.float32)**2))(qs)
gr = jax.grad(lambda a: jnp.sum(reference_attention(a, a, a).astype(jnp.float32)**2))(qs)
print("grad err:", float(jnp.max(jnp.abs(gf.astype(jnp.float32)-gr.astype(jnp.float32)))))
oc = flash_attention(qs, qs, qs, frame_group=512)
rc = reference_attention(qs, qs, qs, frame_group=512)
print("causal fwd err:", float(jnp.max(jnp.abs(oc.astype(jnp.float32)-rc.astype(jnp.float32)))))

@jax.jit
def many(a):
    def body(c, _):
        return flash_attention(c, c, c), None
    out, _ = jax.lax.scan(body, a, None, length=ITERS)
    return jnp.sum(out.astype(jnp.float32))
float(many(q))
t0 = time.perf_counter(); float(many(q)); t1 = time.perf_counter()
t = (t1 - t0) / ITERS
print(f"exp2 kernel: {t*1e3:.2f} ms {flops/t/1e12:.1f} TF/s ({flops/t/197e12*100:.0f}%)")
