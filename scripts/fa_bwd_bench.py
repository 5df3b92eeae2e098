"""Flash-attention BACKWARD kernel throughput (VERDICT r2 #3).

The forward has a block-sweep table in PERF.md; this measures the
backward: fwd-only and fwd+bwd wall-clock at the training (seq 8320) and
full-scale (seq 84,480) geometries, deriving the bwd-side TF/s against
the standard 2.5x-forward attention FLOP model (bwd recomputes qk^T and
does dQ/dK/dV: ~2.5x fwd attention FLOPs; our kernel also recomputes the
forward probabilities from the saved logsumexp).

Run: python scripts/fa_bwd_bench.py [8320|84480|both]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax.numpy as jnp


from cosmos_predict2_tpu.utils.benchmarking import timed  # noqa: E402


def main() -> None:
    from cosmos_predict2_tpu.ops.flash_attention import flash_attention

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    seqs = {"8320": [8320], "84480": [84480], "both": [8320, 84480]}[which]

    peaks = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v4": 275e12, "TPU v6": 918e12}
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in peaks.items() if kind.startswith(k)), 197e12)

    B, H, D = 1, 16, 128
    for S in seqs:
        q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), dtype=jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D), dtype=jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D), dtype=jnp.bfloat16)

        fwd = jax.jit(lambda q, k, v: flash_attention(q, k, v))

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

        fwdbwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        fl_fwd = 4 * S * S * H * D * B
        fl_bwd = 2.5 * fl_fwd  # dQ + dK + dV + qk^T recompute

        t_f = timed(fwd, q, k, v)
        t_fb = timed(fwdbwd, q, k, v)
        t_b = t_fb - t_f
        print(
            f"[seq {S}] fwd {t_f*1e3:7.1f} ms ({fl_fwd/t_f/1e12:5.1f} TF/s, {fl_fwd/t_f/peak*100:4.1f}%)  "
            f"fwd+bwd {t_fb*1e3:7.1f} ms  bwd-alone {t_b*1e3:7.1f} ms "
            f"({fl_bwd/max(t_b,1e-9)/1e12:5.1f} TF/s, {fl_bwd/max(t_b,1e-9)/peak*100:4.1f}% on 2.5x-fwd model)",
            flush=True,
        )


if __name__ == "__main__":
    main()
