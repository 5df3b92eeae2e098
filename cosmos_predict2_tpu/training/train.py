"""Training CLI entry.

Parity with the reference train entry
(packages/cosmos-oss/cosmos_oss/scripts/train.py:36-117):

    python -m cosmos_predict2_tpu.training.train --experiment=NAME [--dryrun] key=value ...

Builds the composed config, instantiates model + mock/local data, sets up
the mesh from (fsdp_shard_size, cp_size, tp_size), and runs the trainer.
COSMOS_SMOKE=1 shrinks max_iter to 2.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="cosmos_predict2_tpu trainer")
    parser.add_argument("--experiment", type=str, default=None)
    parser.add_argument("--dryrun", action="store_true", help="validate config and exit")
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("overrides", nargs="*", help="dotlist overrides key=value")
    return parser.parse_args(argv)


def launch(config, ckpt_dir: str | None = None):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cosmos_predict2_tpu.conditioning.conditioner import make_condition
    from cosmos_predict2_tpu.data.mock import MockDataLoader, normalize_video
    from cosmos_predict2_tpu.models.video2world import Video2WorldModel
    from cosmos_predict2_tpu.parallel.mesh import make_mesh, param_shardings
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE
    from cosmos_predict2_tpu.training.checkpointing import Checkpointer
    from cosmos_predict2_tpu.training.trainer import Trainer
    from cosmos_predict2_tpu.utils import log
    from cosmos_predict2_tpu.utils.flags import SMOKE

    trainer_cfg = config.trainer
    if SMOKE:
        trainer_cfg = dataclasses.replace(trainer_cfg, max_iter=2, logging_iter=1, save_iter=0)

    n_dev = len(jax.devices())
    shard = config.fsdp_shard_size * config.cp_size * config.tp_size
    dp = max(1, n_dev // shard)
    # the global batch shards over (dp, fsdp): shrink dp until it divides
    batch = config.data_train.batch_size
    while dp > 1 and batch % (dp * config.fsdp_shard_size) != 0:
        dp -= 1
    if batch % (dp * config.fsdp_shard_size) != 0:
        raise ValueError(
            f"batch_size {batch} not divisible by dp*fsdp = {dp * config.fsdp_shard_size}"
        )
    mesh = make_mesh(dp, config.fsdp_shard_size, config.cp_size, config.tp_size,
                     devices=jax.devices()[: dp * shard], pp=config.pp_size)
    log.info(f"mesh: dp={dp} fsdp={config.fsdp_shard_size} cp={config.cp_size} tp={config.tp_size}")

    model_cfg = config.model
    if config.cp_size > 1:
        model_cfg = dataclasses.replace(model_cfg, net=dataclasses.replace(model_cfg.net, cp_axis="cp"))
    model = Video2WorldModel(model_cfg)
    vae = WanVAE(config.tokenizer)

    data_cfg = config.data_train
    # loader dispatch by config type (the registry's data_train group):
    # mock for smoke/golden tests, local folder for the documented
    # post-training flow (docs/post_training.md)
    from cosmos_predict2_tpu.data.local_dataset import LocalVideoDataset, LocalVideoDatasetConfig

    if isinstance(data_cfg, LocalVideoDatasetConfig):
        loader = LocalVideoDataset(data_cfg)
    else:
        loader = MockDataLoader(data_cfg)

    ckpt = Checkpointer(ckpt_dir) if ckpt_dir else None
    trainer = Trainer(trainer_cfg, model, checkpointer=ckpt)

    with jax.set_mesh(mesh):
        B = data_cfg.batch_size
        latent_t = 1 + (data_cfg.num_frames - 1) // 4
        latent_shape = (B, model_cfg.state_ch, latent_t, data_cfg.height // 8, data_cfg.width // 8)
        params = model.init_params(jax.random.PRNGKey(trainer_cfg.seed), latent_shape,
                                   text_len=data_cfg.text_len)
        params = jax.device_put(params, param_shardings(params, mesh))
        if model_cfg.use_lora:
            # LoRA post-training: the base stays frozen, the trainable tree
            # (and the checkpointed state) is the adapter pytree — the
            # reference's single-device recipe (experiments/base/
            # cosmos_nemo_assets_lora.py:118-123, add_lora :923)
            from cosmos_predict2_tpu.training.lora import LoRAModelWrapper, count_lora_params

            wrapper = LoRAModelWrapper(
                model, params,
                rank=model_cfg.lora_rank,
                alpha=model_cfg.lora_alpha,
                targets=model_cfg.lora_targets,
            )
            params = wrapper.init_lora(jax.random.PRNGKey(trainer_cfg.seed + 2))
            log.info(f"LoRA rank {model_cfg.lora_rank}: {count_lora_params(params):,} trainable params")
            model = wrapper
            trainer = Trainer(trainer_cfg, model, checkpointer=ckpt)
        vae_params = vae.init(
            jax.random.PRNGKey(trainer_cfg.seed + 1),
            jnp.zeros((1, 5, 32, 32, 3), dtype=jnp.float32),
        )
        state = trainer.init_state(params)
        start_iteration = 0
        if ckpt is not None and ckpt.latest_step() is not None:
            abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), jax.device_get(state))
            state = ckpt.load(abstract)
            start_iteration = int(state.step)
            log.info(f"resumed from iteration {start_iteration}")

        vae_encode = jax.jit(lambda vp, v: vae.apply(vp, v, method=WanVAE.encode))
        latent_sharding = NamedSharding(mesh, P(("dp", "fsdp"), None, "cp"))

        def batches():
            for i, batch in enumerate(loader):
                video = jnp.asarray(normalize_video(batch["video"]))  # (B, 3, T, H, W)
                latents = vae_encode(vae_params, video.transpose(0, 2, 3, 4, 1))
                latents = latents.transpose(0, 4, 1, 2, 3).astype(jnp.float32)
                latents = jax.device_put(latents, latent_sharding)
                cond = make_condition(
                    jnp.asarray(batch["t5_text_embeddings"]),
                    fps=jnp.asarray(batch["fps"]),
                ).replace(gt_frames=latents)
                yield latents, cond

        state = trainer.train(state, batches(), start_iteration=start_iteration)
    return state


def main(argv=None):
    args = parse_args(argv)
    from cosmos_predict2_tpu.configs.defaults import make_config
    from cosmos_predict2_tpu.utils import log

    config = make_config(args.experiment, args.overrides)
    if args.dryrun:
        log.info(f"config OK:\n{config}")
        return 0
    launch(config, ckpt_dir=args.ckpt_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
