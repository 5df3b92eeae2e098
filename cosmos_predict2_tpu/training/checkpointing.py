"""Checkpointing via Orbax.

Replaces the reference's two-format stack — torch DCP sharded checkpoints
with background-process async save (predict2/checkpointer/dcp.py:326-649)
and rank-0 consolidated .pt (imaginaire/utils/checkpointer.py:43-294) —
with Orbax: sharded-by-construction, async by default, and the same
"latest" tracking contract (latest_checkpoint.txt -> Orbax step dirs).

Also provides ``save_consolidated`` / ``load_consolidated``: a single-file
msgpack export of (possibly EMA) params for distribution/inference, the
analogue of convert_distcp_to_pt.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from cosmos_predict2_tpu.utils import log


class Checkpointer:
    """Async sharded checkpoints with step tracking and resume."""

    def __init__(self, directory: str, max_to_keep: int = 5, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: Any, step: int) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(state))
        log.info(f"Saved checkpoint at iteration {step} -> {self.directory}")

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def load(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        restored = self.manager.restore(step, args=ocp.args.StandardRestore(abstract_state))
        log.info(f"Restored checkpoint from iteration {step}")
        return restored

    def close(self):
        self.manager.close()


def save_consolidated(params: Any, path: str) -> None:
    """Single-file export of a param pytree (msgpack via flax serialization)."""
    from flax import serialization

    params = jax.device_get(params)
    data = serialization.to_bytes(params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    log.info(f"Exported consolidated params -> {path} ({len(data) / 1e6:.1f} MB)")


def load_consolidated(template: Any, path: str) -> Any:
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def load_ema_to_reg(state: Any, dtype=None) -> Any:
    """Swap EMA weights into the regular-params slot for inference
    (reference checkpointer/dcp.py:205-280 ``load_ema_to_reg`` — released
    checkpoints and samples use the EMA weights).

    Takes a restored TrainState(-like) pytree; returns it with
    ``params = ema_params`` (cast to ``dtype`` if given). No-op when the
    checkpoint has no EMA."""
    ema = getattr(state, "ema_params", None)
    if ema is None:
        return state
    params = jax.tree.map(lambda p: p.astype(dtype) if dtype is not None else p, ema)
    return state.replace(params=params)
