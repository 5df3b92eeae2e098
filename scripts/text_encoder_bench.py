"""On-chip latency of the Qwen2.5-VL-7B text encoder forward + pooling.

The last unmeasured pipeline stage: the reference computes prompt
embeddings online through Qwen2.5-VL-7B with hidden-state pooling
(predict2/text_encoders/text_encoder.py:131-220); here that is
`CosmosTextEncoder.encode_tokens` (one jitted forward over 512 tokens ->
pool -> (B, 512, 3584*concat) crossattn embedding).

7B bf16 weights = ~14.2 GB — they fit a 16 GB v5e alongside the tiny
512-token activations (production would co-locate with the DiT via staged
offload or a second chip; the reference likewise offloads the text encoder
between stages, video2world.py:493-578).

Run: python scripts/text_encoder_bench.py [batch ...] (default 1 2)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np

from cosmos_predict2_tpu.text_encoders.text_encoder import CosmosTextEncoder, TextEncoderConfig


def main() -> None:
    tiny = "--tiny" in sys.argv[1:]  # CPU smoke of the bench plumbing
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 2]
    from cosmos_predict2_tpu.text_encoders.qwen import QwenConfig

    cfg = TextEncoderConfig(model=QwenConfig.tiny(), num_padding_tokens=16) if tiny else TextEncoderConfig()
    enc = CosmosTextEncoder(cfg)
    mc = cfg.model
    print(
        f"[te] Qwen2.5-VL-7B LM: hidden {mc.hidden_size}, layers {mc.num_hidden_layers}, "
        f"vocab {mc.vocab_size}; seq {cfg.num_padding_tokens}",
        flush=True,
    )

    # random bf16 weights initialized ON DEVICE (a host-side 14 GB tree
    # through the tunnel would take minutes)
    shapes = jax.eval_shape(lambda: enc.lm.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)))
    leaves = jax.tree.leaves(shapes)
    nparam = sum(int(np.prod(s.shape)) for s in leaves)
    print(f"[te] params: {nparam / 1e9:.2f} B ({nparam * 2 / 2**30:.1f} GiB bf16)", flush=True)
    # eager per-leaf device init (the pattern proven on-chip by
    # full_scale_probe.make_params); a single jitted tree-init traced with a
    # key iterator crashed the axon tunnel at the 338-leaf 7B scale
    keys = iter(jax.random.split(jax.random.PRNGKey(42), len(leaves)))
    params = jax.tree.map(
        lambda s: (jax.random.normal(next(keys), s.shape, jnp.bfloat16) * 0.02), shapes
    )
    enc.params = params

    # matmul FLOPs per token (no vocab head — the encoder never projects to
    # logits). GQA: q/o are d->d, k/v are d->kv_width (4 kv heads on 7B)
    S = cfg.num_padding_tokens
    d, L, ff = mc.hidden_size, mc.num_hidden_layers, getattr(mc, "intermediate_size", 18944)
    kv_width = mc.num_key_value_heads * mc.head_dim
    per_tok = L * (4 * d * d + 4 * d * kv_width + 6 * d * ff) + L * 4 * S * d
    kind = jax.devices()[0].device_kind
    peaks = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v4": 275e12, "TPU v6": 918e12}
    peak = next((v for k, v in peaks.items() if kind.startswith(k)), 197e12)

    for B in batches:
        ids = jnp.asarray(np.random.RandomState(0).randint(1, min(150000, mc.vocab_size - 1), (B, S)), jnp.int32)
        out = enc.encode_tokens(ids)  # compile
        _ = float(jnp.sum(out[:, :1].astype(jnp.float32)))
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            out = enc.encode_tokens(ids)
            _ = float(jnp.sum(out[:, :1].astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        t = float(np.min(times))
        # per_tok already counts 2 FLOPs per MAC (the 4dd/6dff coefficients)
        fl = B * S * per_tok
        print(
            f"[te] B={B}: {t * 1e3:.0f} ms/forward+pool  ({fl / t / 1e12:.1f} TF/s, "
            f"{fl / t / peak * 100:.1f}% of {kind} peak)  out {tuple(out.shape)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
