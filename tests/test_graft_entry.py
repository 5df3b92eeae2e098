"""Pin the driver's __graft_entry__ calling convention.

The driver imports ``__graft_entry__`` under the live TPU plugin (ONE
device) and calls ``dryrun_multichip(8)`` — round 1 shipped a version
that assumed the caller had pre-arranged 8 devices and failed exactly
there (MULTICHIP_r01.json ok=false). These tests invoke the function the
way the driver does, from a process that has only 1 device, and require
it to self-bootstrap a virtual CPU mesh (reference 8-GPU test-tier
semantics: reference conftest.py:72-140).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.level(0)
def test_entry_compiles():
    import __graft_entry__ as g
    import jax

    fn, args = g.entry()
    jax.jit(fn).lower(*args).compile()


@pytest.mark.level(1)
def test_dryrun_multichip_self_bootstraps_from_one_device():
    # Simulate the driver: a process whose jax backend has exactly ONE
    # device imports the module and calls dryrun_multichip(8). The
    # function must succeed by re-executing itself with a virtual mesh.
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 1)\n"
        "assert len(jax.devices()) == 1\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "[dryrun_multichip] OK" in proc.stdout


@pytest.mark.level(2)
def test_dryrun_fullgeom_real_geometry():
    """VERDICT r3 #4: ONE sharded train step at the REAL 720p latent
    geometry — cp=4 x fsdp=2 over latent (2, 16, 24, 88, 160), seq 84480
    (21,120 tokens/chip), production sparse-NA window/stride. Level 2:
    ~30-60 min on the single-core virtual mesh; run manually or by the
    driver (`python __graft_entry__.py fullgeom`)."""
    import __graft_entry__ as g

    g.dryrun_fullgeom(8)
