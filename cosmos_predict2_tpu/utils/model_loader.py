"""Experiment + checkpoint -> ready pipeline (library API).

Parity with the reference model loader
(cosmos_predict2/_src/predict2/utils/model_loader.py:48-140
``load_model_from_checkpoint``: resolve the experiment config, build the
model, load weights — EMA by default — and return it ready for
inference). The CLI (inference/cli.py) is a thin shell over this.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


def load_model_from_checkpoint(
    experiment_name: str,
    checkpoint_path: Optional[str] = None,
    vae_path: Optional[str] = None,
    text_encoder_path: Optional[str] = None,
    tokenizer_path: Optional[str] = None,
    resolution: str = "480",
    load_ema_to_reg: bool = True,
    size_override: Optional[tuple[int, int]] = None,
):
    """Returns (Video2WorldInference, Config). Checkpoints may be torch
    (.pt/.pth/.safetensors, converted on load) or consolidated .msgpack;
    None => random init (smoke/plumbing)."""
    from types import SimpleNamespace

    from cosmos_predict2_tpu.inference.cli import build_pipeline
    from cosmos_predict2_tpu.configs.defaults import make_config

    args = SimpleNamespace(
        experiment=experiment_name,
        checkpoint=checkpoint_path,
        vae=vae_path,
        text_encoder=text_encoder_path,
        tokenizer_path=tokenizer_path,
        resolution=resolution,
    )
    pipe = build_pipeline(args)
    if size_override is not None:
        pipe.setup = dataclasses.replace(pipe.setup, size_override=size_override)
    return pipe, make_config(experiment_name)
