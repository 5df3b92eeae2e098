"""Checkpoint registry: UUID-keyed database of released model artifacts.

Capability parity with the reference checkpoint DB
(cosmos_predict2/_src/imaginaire/utils/checkpoint_db.py:179-732): each entry
pins a UUID, a human name, metadata (resolution / fps / variant), the
experiment that produced it, and download locations (HuggingFace repo or
URI). ``get_checkpoint_path`` resolves a UUID/name to a local file,
downloading from HF hub when available (gated: offline environments raise
with a clear message).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

_DB: dict[str, "CheckpointEntry"] = {}


@dataclasses.dataclass(frozen=True)
class CheckpointEntry:
    uuid: str
    name: str
    experiment: str
    resolution: str = "720"
    fps: int = 16
    variant: str = "base"  # base | auto_multiview | robot_action | distilled
    hf_repo: Optional[str] = None
    hf_filename: Optional[str] = None
    uri: Optional[str] = None
    notes: str = ""


def register_checkpoint(entry: CheckpointEntry) -> None:
    _DB[entry.uuid] = entry
    _DB[entry.name] = entry


def get_checkpoint_by_uuid(key: str) -> CheckpointEntry:
    if key not in _DB:
        raise KeyError(f"unknown checkpoint '{key}'; known: {sorted(set(e.name for e in _DB.values()))}")
    return _DB[key]


def list_checkpoints() -> list[CheckpointEntry]:
    seen = {}
    for e in _DB.values():
        seen[e.uuid] = e
    return sorted(seen.values(), key=lambda e: e.name)


def get_checkpoint_path(key: str, cache_dir: Optional[str] = None) -> str:
    """Resolve to a local path; download from HF hub on first use."""
    entry = get_checkpoint_by_uuid(key)
    cache_dir = cache_dir or os.environ.get("COSMOS_CHECKPOINT_DIR", os.path.expanduser("~/.cache/cosmos_tpu"))
    if entry.uri and os.path.exists(entry.uri):
        return entry.uri
    local = os.path.join(cache_dir, entry.name, entry.hf_filename or "model.pt")
    if os.path.exists(local):
        return local
    if entry.hf_repo is None:
        raise FileNotFoundError(f"checkpoint '{entry.name}' not found locally and has no HF repo")
    try:
        from huggingface_hub import hf_hub_download

        return hf_hub_download(entry.hf_repo, entry.hf_filename, cache_dir=cache_dir)
    except Exception as e:  # offline / missing hub
        raise FileNotFoundError(
            f"checkpoint '{entry.name}' not cached at {local} and download failed ({e}); "
            f"place the file there manually"
        ) from e


# --------------------------- released models ---------------------------
# UUID-pinned entries mirroring the reference's release registry
# (cosmos_predict2/config.py:169-177 MODEL_CHECKPOINTS).

register_checkpoint(
    CheckpointEntry(
        uuid="d20b7120-df3e-4911-919d-db593e1d2dcf",
        name="cosmos_predict2.5_2b_base",
        experiment="predict2_video2world_2b_rectified_flow",
        hf_repo="nvidia/Cosmos-Predict2.5-2B",
        hf_filename="model.pt",
        notes="2B unified Text2World/Image2World/Video2World, 720p 16fps",
    )
)
register_checkpoint(
    CheckpointEntry(
        uuid="e21b1c5d-6a43-4e12-9020-0d6e7f6e8a11",
        name="cosmos_predict2.5_14b_base",
        experiment="predict2_video2world_14b_rectified_flow",
        hf_repo="nvidia/Cosmos-Predict2.5-14B",
        hf_filename="model.pt",
    )
)
register_checkpoint(
    CheckpointEntry(
        uuid="a7b41cd1-4d43-4fc8-9a1e-0a4e55dd1a2b",
        name="wan2.1_vae",
        experiment="-",
        hf_repo="Wan-AI/Wan2.1-T2V-1.3B",
        hf_filename="Wan2.1_VAE.pth",
        notes="causal video VAE tokenizer weights",
    )
)
register_checkpoint(
    CheckpointEntry(
        uuid="f1e8cb5f-2bb1-4b38-8a31-3d7e94cf3e30",
        name="cosmos_reason1_7b_text_encoder",
        experiment="-",
        hf_repo="nvidia/Cosmos-Reason1-7B",
        hf_filename="model.safetensors",
        notes="Qwen2.5-VL-7B based text encoder",
    )
)
