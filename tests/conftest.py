"""Test harness: tests run on a virtual 8-device CPU mesh.

Mirrors the reference's marker/level test tiers (conftest.py:72-140 there):
``@pytest.mark.chips(n)`` declares how many devices a test needs (0/1 = any,
8 = needs the full virtual mesh), ``@pytest.mark.level(n)`` declares cost
tier (0 = fast unit, 1 = slower integration, 2 = manual/benchmark).
Level>=2 tests are skipped unless --level is raised.
"""

import os

# Must happen before jax backend initialization. Note: this environment's
# TPU plugin overrides JAX_PLATFORMS at import time, so the env var alone is
# not enough — we also force the config after import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compilation cache: the VAE/DiT conv graphs dominate suite time
# on the single host core; caching makes reruns ~5x faster. Machine-keyed
# subdir (utils/cache_dirs.py): XLA:CPU AOT entries compiled on another host
# spew "could lead to SIGILL" errors when loaded here.
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cosmos_predict2_tpu.utils.cache_dirs import cpu_compilation_cache_dir  # noqa: E402

_cache_dir = cpu_compilation_cache_dir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "chips(n): number of devices the test needs")
    config.addinivalue_line("markers", "level(n): cost tier (0 fast, 1 slow, 2 manual)")


def pytest_addoption(parser):
    parser.addoption("--level", type=int, default=1, help="max test level to run")


def pytest_collection_modifyitems(config, items):
    max_level = config.getoption("--level")
    skip = pytest.mark.skip(reason=f"level exceeds --level={max_level}")
    for item in items:
        marker = item.get_closest_marker("level")
        if marker and marker.args and marker.args[0] > max_level:
            item.add_marker(skip)
