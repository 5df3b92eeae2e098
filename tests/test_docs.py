"""Docs-command tests (reference tests/docs_test.py:62-87: run the actual
documented shell commands in a subprocess under COSMOS_SMOKE=1)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.level(0)
def test_cli_help():
    r = subprocess.run(
        [sys.executable, "-m", "cosmos_predict2_tpu.inference.cli", "--help"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert r.returncode == 0 and "--prompt" in r.stdout


@pytest.mark.level(0)
def test_train_cli_help():
    r = subprocess.run(
        [sys.executable, "-m", "cosmos_predict2_tpu.training.train", "--help"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert r.returncode == 0 and "--experiment" in r.stdout


@pytest.mark.level(1)
def test_interactive_example_smoke():
    """examples/interactive.py streams under COSMOS_SMOKE on the CPU mesh."""
    env = dict(os.environ, COSMOS_SMOKE="1", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "examples/interactive.py", "--frames", "3", "--cache-frames", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "streamed 3 latent frames" in r.stdout


@pytest.mark.level(2)  # documented command end-to-end; heavy compile on CPU
def test_documented_inference_smoke(tmp_path):
    env = dict(os.environ, COSMOS_SMOKE="1", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "cosmos_predict2_tpu.inference.cli",
         "--prompt", "a robot pouring coffee", "--output-dir", str(tmp_path)],
        capture_output=True, text=True, cwd=REPO, timeout=1800, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert any(f.startswith("sample") for f in os.listdir(tmp_path))
