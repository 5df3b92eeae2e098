"""Multi-host launch helpers.

Replaces the reference's torchrun + ``distributed.init`` entry
(imaginaire/utils/distributed.py:49 + trainer.py:67-89): on TPU pods one
process per host drives its local chips; ``jax.distributed.initialize``
wires the hosts together and the global mesh spans all devices.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from cosmos_predict2_tpu.utils import log


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op for single-host runs.

    On Cloud TPU the arguments are auto-detected from the metadata server;
    elsewhere pass them (or set COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID, mirroring torchrun's MASTER_ADDR/WORLD_SIZE/RANK contract).
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "0")) or None
    process_id = process_id if process_id is not None else (
        int(os.environ["PROCESS_ID"]) if "PROCESS_ID" in os.environ else None
    )
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()  # TPU pod auto-detection
        except Exception as e:
            log.info(f"single-host run (jax.distributed auto-init unavailable: {e})")
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    log.info(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )


def world_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
