"""Process-0-filtered logging.

TPU-native replacement for the reference's loguru wrapper
(cosmos_predict2/_src/imaginaire/utils/log.py): in a multi-host JAX job each
host runs one process; by default only process 0 emits logs. Any record can
opt out with ``all_hosts=True``.
"""

from __future__ import annotations

import logging
import os
import sys

_LOGGER = logging.getLogger("cosmos_predict2_tpu")


def _process_index() -> int:
    # Avoid importing jax at module import time (keeps CLI help fast) and
    # avoid calling jax.process_index() before distributed init.
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("JAX_PROCESS_INDEX", "0"))


def init(level: int | str | None = None, log_file: str | None = None) -> None:
    """Initialise the logger. Safe to call multiple times."""
    from cosmos_predict2_tpu.utils.flags import VERBOSE

    if level is None:
        level = logging.DEBUG if VERBOSE else logging.INFO
    _LOGGER.setLevel(level)
    if not _LOGGER.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("[%(asctime)s|%(levelname)s|%(filename)s:%(lineno)d] %(message)s", "%H:%M:%S")
        )
        _LOGGER.addHandler(handler)
    if log_file is not None:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter("[%(asctime)s|%(levelname)s|%(filename)s:%(lineno)d] %(message)s"))
        _LOGGER.addHandler(fh)


def _log(level: int, msg: str, all_hosts: bool = False) -> None:
    if not _LOGGER.handlers:
        init()
    if all_hosts or _process_index() == 0:
        _LOGGER.log(level, msg, stacklevel=3)


def debug(msg: str, all_hosts: bool = False) -> None:
    _log(logging.DEBUG, msg, all_hosts)


def info(msg: str, all_hosts: bool = False) -> None:
    _log(logging.INFO, msg, all_hosts)


def warning(msg: str, all_hosts: bool = False) -> None:
    _log(logging.WARNING, msg, all_hosts)


def error(msg: str, all_hosts: bool = False) -> None:
    _log(logging.ERROR, msg, all_hosts)


def critical(msg: str, all_hosts: bool = False) -> None:
    _log(logging.CRITICAL, msg, all_hosts)
