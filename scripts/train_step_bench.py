"""Training-path MFU on the real chip: 2B DiT fwd+bwd (the FLOP-dominant
part of a training step) at the post-training geometry.

The reference post-trains the 2B on multi-GPU FSDP (SURVEY §3.2); a single
16 GB chip cannot hold params+grads+Adam moments at full scale, so — like
the reference's per-GPU microbatch — we measure the per-chip fwd+bwd step
(grads only; the AdamW/EMA update is bandwidth-trivial and is covered by
the trainer tests) and report MFU with the standard 3x-forward FLOP model.

Run: python scripts/train_step_bench.py [seq8320|seq21120]
"""

from __future__ import annotations

import dataclasses
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

from bench import dit_flops_per_forward
from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT

GEOMS = {
    # post-training local-data recipe geometry (SURVEY §2.5: 93f 704x1280 is
    # the multi-chip config; per-chip microbatch uses the short clip)
    "seq8320": (1, 16, 5, 64, 104),  # 17f 512x832
    "seq13312": (1, 16, 8, 64, 104),  # 29f 512x832
    "seq16640": (1, 16, 10, 64, 104),  # 37f 512x832
    "seq21120": (1, 16, 12, 64, 104),  # 45f 512x832 (longer clip, more attn-bound)
    "seq84480": (1, 16, 24, 88, 160),  # 93f 704x1280 — the full-scale clip
    "seq42240": (1, 16, 12, 88, 160),  # 45f 704x1280 (half-T full-res)
}


def main() -> None:
    args = [a for a in sys.argv[1:] if a not in ("--sparse", "--lora", "--scan", "--uniform")]
    sparse = "--sparse" in sys.argv[1:]
    lora = "--lora" in sys.argv[1:]
    scan = "--scan" in sys.argv[1:]  # scan-over-blocks: ~28x smaller HLO
    # --uniform: ONE scan + runtime dense/sparse lax.cond switch — each NA
    # Mosaic kernel compiles once per program (compile-helper relief)
    uniform = "--uniform" in sys.argv[1:]
    geom = args[0] if args else "seq8320"
    modes = tuple(args[1:]) or ("selective", "block")
    LATENT = GEOMS[geom]
    B, C, T, H, W = LATENT
    seq = T * (H // 2) * (W // 2)

    base = DiTConfig(
        model_channels=2048,
        num_heads=16,
        num_blocks=28,
        use_adaln_lora=True,
        rope_h_extrapolation_ratio=3.0,
        rope_w_extrapolation_ratio=3.0,
        rope_enable_fps_modulation=False,
        dtype=jnp.bfloat16,
        # --sparse: the reference production sparse recipe (sparse_2B.py:
        # 326-327) — 1.55-1.94x cheaper activations may fit where dense OOMs
        n_dense_blocks=7 if sparse else -1,
        natten_window=(-1, 12, 24),
        natten_stride=(1, 4, 8) if sparse else (1, 1, 1),
        natten_base_size=(-1, 44, 80) if sparse else None,
    )
    if sparse:
        print(f"[train] SPARSE recipe (n_dense_blocks=7, window (-1,12,24), stride (1,4,8))", flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), LATENT, dtype=jnp.bfloat16)
    ts = jnp.full((B,), 500.0, dtype=jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 512, 1024), dtype=jnp.bfloat16) * 0.02
    target = jax.random.normal(jax.random.PRNGKey(2), LATENT, dtype=jnp.bfloat16)

    peaks = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v4": 275e12, "TPU v6": 918e12}
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in peaks.items() if kind.startswith(k)), 197e12)
    # fwd + bwd = 3x forward FLOPs (bwd does 2 matmuls per fwd matmul)
    flops = 3 * dit_flops_per_forward(
        seq, base.model_channels, base.num_blocks, int(base.model_channels * 4),
        tokens_per_frame=(H // 2) * (W // 2),
    )

    for mode in modes:
        net = MiniTrainDIT(dataclasses.replace(base, remat=mode, scan_blocks=scan or uniform, scan_uniform=uniform))
        shapes = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x, ts, ctx))
        keys = iter(jax.random.split(jax.random.PRNGKey(42), len(jax.tree.leaves(shapes))))
        # bf16 directly: an f32 intermediate tree (7.3 GiB for the 2B) plus
        # the 12.8 GiB step working set would overrun the 16 GB chip
        def init_leaf(path, s):
            # weights ('kernel') get bf16 randn; biases/norm scales zeros —
            # keyed by param NAME, not ndim (scan_blocks stacks a leading
            # segment axis onto every block leaf)
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name == "kernel":
                return jax.random.normal(next(keys), s.shape, jnp.bfloat16) * 0.02
            return jnp.zeros(s.shape, s.dtype)

        params = jax.tree_util.tree_map_with_path(init_leaf, shapes)

        if lora:
            # the reference's single-device post-training mode (SURVEY §2.5
            # LoRA recipes): base params frozen, grads only for the adapters
            from cosmos_predict2_tpu.training.lora import init_lora_params, merge_lora

            lora_tree = init_lora_params(jax.random.PRNGKey(9), params, rank=16)

            def loss_fn(lt, base):
                v = net.apply(merge_lora(base, lt, rank=16), x, ts, ctx)
                return jnp.mean(jnp.square((v - target).astype(jnp.float32)))

            step = jax.jit(jax.value_and_grad(loss_fn))
            orig_step = step
            step = lambda p: orig_step(lora_tree, p)
            print("[train] LoRA rank 16 (base frozen)", flush=True)
        else:

            def loss_fn(p):
                v = net.apply(p, x, ts, ctx)
                return jnp.mean(jnp.square((v - target).astype(jnp.float32)))

            step = jax.jit(jax.value_and_grad(loss_fn))
        print(f"[train] remat={mode} seq={seq} compiling ...", flush=True)

        # NB: block_until_ready does not actually sync through the axon
        # tunnel; fetch a scalar to force execution.
        def sync(g):
            return float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32)))

        try:
            l, g = step(params)
            sync(g)
        except Exception as e:  # OOM at larger geometry: report and continue
            print(f"[train] remat={mode}: FAILED ({type(e).__name__}: {str(e)[:120]})", flush=True)
            continue
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            l, g = step(params)
            sync(g)
            times.append(time.perf_counter() - t0)
        t = float(np.min(times))
        print(
            f"[train] remat={mode} seq={seq}: t_fwd+bwd={t * 1e3:.0f} ms  "
            f"MFU={flops / t / peak * 100:.1f}% ({flops / t / 1e12:.1f} TF/s on {kind})",
            flush=True,
        )


if __name__ == "__main__":
    main()
