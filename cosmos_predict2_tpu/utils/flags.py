"""Environment feature flags.

Mirrors the reference's flag contract (cosmos_predict2/_src/imaginaire/flags.py:27-40):
``COSMOS_SMOKE`` shrinks everything for smoke tests (1 sampling step, tiny
iteration counts, random weights), ``COSMOS_VERBOSE`` raises log verbosity.
"""

from __future__ import annotations

import os


def _env_flag(name: str) -> bool:
    return os.environ.get(name, "").lower() in ("1", "true", "yes", "on")


SMOKE: bool = _env_flag("COSMOS_SMOKE")
VERBOSE: bool = _env_flag("COSMOS_VERBOSE")
INTERNAL: bool = _env_flag("COSMOS_INTERNAL")
