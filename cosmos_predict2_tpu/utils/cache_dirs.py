"""Machine-keyed JAX compilation-cache locations.

The persistent compilation cache stores XLA:CPU AOT executables whose code
is specialized to the *compiling* host's CPU features. Sharing one cache
directory across machines (repo checked out on several hosts, or a driver
host differing from the dev host) makes XLA:CPU log a wall of
"machine feature ... not supported on the host machine / could lead to
SIGILL" errors on every load — and genuinely risks SIGILL if the features
matter. TPU executables don't have this problem (keyed by chip target),
so only CPU-backend runs need segregation: key the CPU cache subdir by a
fingerprint of the host's CPU feature flags.

One warning survives even same-host: XLA records its compile PREFERENCES
(``+prefer-no-scatter``/``+prefer-no-gather``) in the AOT feature list and
complains they are "not supported on the host" on every load, including
entries compiled by the loading machine itself. Those two pseudo-feature
lines are benign; ``__graft_entry__.dryrun_multichip`` filters exactly
them from the subprocess stderr.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _machine_key() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = platform.processor()
    # normalize: flag order inside /proc/cpuinfo is stable per kernel but
    # sort anyway so equivalent machines hash equal
    toks = " ".join(sorted(flags.split()))
    return hashlib.sha1((platform.machine() + ":" + toks).encode()).hexdigest()[:10]


def cpu_compilation_cache_dir(repo_root: str) -> str:
    """Cache dir for CPU-backend runs: ``<repo>/.jax_cache/cpu-<hostkey>``."""
    return os.path.join(repo_root, ".jax_cache", f"cpu-{_machine_key()}")
