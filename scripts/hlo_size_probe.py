"""Lower (do NOT compile) the full 2B fwd+bwd train step for the axon TPU
target and print StableHLO sizes + Mosaic kernel counts.

The remote-compile helper crashes (HTTP 500) on sparse fwd+bwd programs at
seq >= 16640; lowering locally is safe — this probe separates "how big is
the program / how many distinct Mosaic kernels does it carry" from the
helper's compile step, ON the real platform (a CPU lowering would route
the NA dispatch to the dense reference implementation and measure the
wrong program).

Usage: python scripts/hlo_size_probe.py [seq42240|seq84480|...] [--uniform]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts.train_step_bench import GEOMS  # noqa: E402  (same geometry table)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    uniform = "--uniform" in sys.argv[1:]
    geoms = args or ["seq42240", "seq84480"]

    from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT

    for geom in geoms:
        LATENT = GEOMS[geom]
        B, C, T, H, W = LATENT
        for name, scan_uniform in ([("uniform", True)] if uniform else [("segments", False), ("uniform", True)]):
            cfg = DiTConfig(
                model_channels=2048, num_heads=16, num_blocks=28, use_adaln_lora=True,
                rope_h_extrapolation_ratio=3.0, rope_w_extrapolation_ratio=3.0,
                rope_enable_fps_modulation=False, dtype=jnp.bfloat16, remat="block",
                n_dense_blocks=7, natten_window=(-1, 12, 24), natten_stride=(1, 4, 8),
                natten_base_size=(-1, 44, 80), scan_blocks=True, scan_uniform=scan_uniform,
            )
            net = MiniTrainDIT(cfg)
            x = jax.ShapeDtypeStruct(LATENT, jnp.bfloat16)
            ts = jax.ShapeDtypeStruct((B,), jnp.float32)
            ctx = jax.ShapeDtypeStruct((B, 512, 1024), jnp.bfloat16)
            shapes = jax.eval_shape(
                lambda: net.init(
                    jax.random.PRNGKey(0), jnp.zeros(LATENT, jnp.bfloat16),
                    jnp.zeros((B,), jnp.float32), jnp.zeros((B, 512, 1024), jnp.bfloat16),
                )
            )
            target = jax.ShapeDtypeStruct(LATENT, jnp.bfloat16)

            def loss_fn(p, x, ts, ctx, target):
                v = net.apply(p, x, ts, ctx)
                return jnp.mean(jnp.square((v - target).astype(jnp.float32)))

            print(f"[hlo] {geom} {name}: lowering ...", flush=True)
            txt = jax.jit(jax.value_and_grad(loss_fn)).lower(shapes, x, ts, ctx, target).as_text()
            kernels = txt.count("tpu_custom_call")
            print(
                f"[hlo] {geom} {name}: stablehlo {len(txt) / 1e6:.2f} MB, "
                f"{txt.count(chr(10)) / 1e3:.0f}k lines, tpu_custom_call sites={kernels}",
                flush=True,
            )


if __name__ == "__main__":
    main()
