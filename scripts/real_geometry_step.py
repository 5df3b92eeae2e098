"""ONE sharded train step at the REAL production latent geometry.

VERDICT r3 #4: the multi-chip training claim rested on tiny-shape dryruns;
this script executes the full fwd+bwd+AdamW+EMA step program at the
flagship clip geometry — 93 frames @ 704x1280 -> latent (16, 24, 88, 160)
-> 84,480 DiT tokens — on a cp=4 x fsdp=2 virtual mesh (21,120 tokens per
chip, the geometry PERF.md projects for production training; reference
hot loop: SURVEY.md section 3.2, trainer.py:193-254 there).

What is REAL here: the latent/sequence geometry, the (dp, fsdp, cp) mesh
and all of its collectives (Ulysses head<->seq all_to_alls, FSDP
all-gathers, gradient reduce-scatters), the trainer step (loss, AdamW,
EMA), and the memory-bounded blockwise attention program that makes an
84k-token dense attention executable off-TPU. What is scaled down: the
network WIDTH (channels/blocks via --channels/--blocks) — one host CPU
core cannot push 2B-parameter FLOPs through 84k tokens in tractable time,
and width changes neither the sharding program nor the collective
schedule, only the GEMM sizes.

Run (defaults: full geometry, 8 virtual CPU devices):
    python scripts/real_geometry_step.py
Calibration run (quarter-T geometry):
    python scripts/real_geometry_step.py --latent-t 6
"""

from __future__ import annotations

import argparse
import json
import os
import time

# must precede any jax backend init
import jax

if os.environ.get("JAX_PLATFORMS", "") != "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
from cosmos_predict2_tpu.utils.cache_dirs import cpu_compilation_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_compilation_cache_dir(repo))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def run(
    latent_t: int, channels: int, heads: int, blocks: int, dp: int, fsdp: int, cp: int,
    sparse: bool = False,
) -> dict:
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cosmos_predict2_tpu.conditioning.conditioner import make_condition
    from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
    from cosmos_predict2_tpu.networks.dit import DiTConfig
    from cosmos_predict2_tpu.parallel.mesh import make_mesh, param_shardings
    from cosmos_predict2_tpu.training.optim import OptimizerConfig
    from cosmos_predict2_tpu.training.trainer import Trainer, TrainerConfig

    n = dp * fsdp * cp
    assert len(jax.devices()) >= n, f"need {n} devices, have {len(jax.devices())}"
    mesh = make_mesh(dp, fsdp, cp, 1, devices=jax.devices()[:n])

    sparse_kw = {}
    if sparse:
        # the production full-res sparse recipe's NA geometry (reference
        # resume_text2world/sparse_2B.py:327): window (-1, 12, 24), stride
        # (1, 4, 8), tuned at base (-1, 44, 80) — at the real 44x80 token
        # grid the adaptive scaling is identity, so this runs the exact
        # production window. All blocks sparse: dense 84k-token attention
        # off-TPU is memory-bandwidth-bound into hours (the dense program
        # itself is executed at --latent-t 4, and on the real chip by the
        # flash kernel at full seq — scripts/full_scale_probe.py cfg).
        sparse_kw = dict(
            n_dense_blocks=0,
            natten_window=(-1, 12, 24),
            natten_stride=(1, 4, 8),
            natten_base_size=(-1, 44, 80),
        )
    net_cfg = DiTConfig(
        model_channels=channels,
        num_heads=heads,
        num_blocks=blocks,
        adaln_lora_dim=32,
        dtype=jnp.float32,
        remat="block",  # the production remat policy at this seq length
        cp_axis="cp" if cp > 1 else None,
        **sparse_kw,
    )
    model = Video2WorldModel(RFModelConfig(net=net_cfg, state_t=latent_t))
    trainer = Trainer(
        TrainerConfig(
            max_iter=1,
            save_iter=0,
            optimizer=OptimizerConfig(warm_up_steps=(2,), cycle_lengths=(10,)),
        ),
        model,
    )

    B = dp * fsdp
    latent_shape = (B, 16, latent_t, 88, 160)
    tokens = latent_t * (88 // 2) * (160 // 2)
    print(
        f"[real_geometry] mesh dp={dp} fsdp={fsdp} cp={cp} | latent {latent_shape} "
        f"-> {tokens} tokens/sample ({tokens // cp} per chip) | "
        f"net {channels}ch/{heads}h/{blocks}blk{' SPARSE-NA(-1,12,24)/(1,4,8)' if sparse else ''}",
        flush=True,
    )

    t0 = time.perf_counter()
    with jax.set_mesh(mesh):
        # init on a TINY latent: DiT parameters are input-shape-independent
        # (RoPE/pos-emb are computed, not learned, in this config), and the
        # un-jitted flax init would otherwise run the full 84k-token forward
        # eagerly (measured 241 s at even quarter-T geometry).
        params = model.init_params(jax.random.PRNGKey(0), (B, 16, cp, 8, 8), text_len=512)
        params = jax.device_put(params, param_shardings(params, mesh))
        state = trainer.init_state(params)
        x0 = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), latent_shape, dtype=jnp.float32),
            NamedSharding(mesh, P(("dp", "fsdp"), None, "cp")),
        )
        emb = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(2), (B, 512, 1024)) * 0.02,
            NamedSharding(mesh, P(("dp", "fsdp"))),
        )
        cond = make_condition(emb).replace(gt_frames=x0)
        t_setup = time.perf_counter() - t0
        print(f"[real_geometry] init+shard {t_setup:.1f}s; compiling+running step ...", flush=True)

        t1 = time.perf_counter()
        state, metrics = trainer._train_step(state, x0, cond, jax.random.PRNGKey(3))
        loss = float(metrics["loss"])
        t_step = time.perf_counter() - t1
    assert np.isfinite(loss), f"non-finite loss {loss}"
    result = {
        "latent": list(latent_shape),
        "tokens_per_sample": tokens,
        "tokens_per_chip": tokens // cp,
        "mesh": {"dp": dp, "fsdp": fsdp, "cp": cp},
        "net": {"channels": channels, "heads": heads, "blocks": blocks, "sparse": sparse},
        "loss": loss,
        "setup_s": round(t_setup, 1),
        "step_s": round(t_step, 1),
    }
    print(f"[real_geometry] OK: loss={loss:.4f} step(compile+run)={t_step:.1f}s", flush=True)
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--latent-t", type=int, default=24)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--fsdp", type=int, default=2)
    ap.add_argument("--cp", type=int, default=4)
    ap.add_argument("--sparse", action="store_true", help="production sparse-NA attention (sparse_2B recipe geometry)")
    ap.add_argument("--json-out", type=str, default=None)
    args = ap.parse_args()
    result = run(
        args.latent_t, args.channels, args.heads, args.blocks, args.dp, args.fsdp, args.cp,
        sparse=args.sparse,
    )
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"[real_geometry] wrote {args.json_out}", flush=True)


if __name__ == "__main__":
    main()
