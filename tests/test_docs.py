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


def _doc_bash_blocks(doc: str) -> list[str]:
    """All ```bash ...``` blocks from a docs file, one command per block."""
    import re

    text = open(os.path.join(REPO, "docs", doc)).read()
    return [b.strip() for b in re.findall(r"```bash\n(.*?)```", text, flags=re.DOTALL)]


def _split_command(block: str) -> list[str]:
    import shlex

    return shlex.split(block.replace("\\\n", " "))


@pytest.mark.level(1)
def test_documented_posttrain_smoke():
    """Run the post-training smoke command from docs/post_training.md
    VERBATIM (the reference's docs_test.py:62-87 pattern — docs drift
    breaks this test)."""
    blocks = [b for b in _doc_bash_blocks("post_training.md") if b.startswith("COSMOS_SMOKE=1")]
    assert blocks, "docs/post_training.md lost its documented smoke command"
    argv = _split_command(blocks[0])
    assert argv[0] == "COSMOS_SMOKE=1" and argv[1] == "python"
    env = dict(os.environ, COSMOS_SMOKE="1")
    r = subprocess.run(
        [sys.executable] + argv[2:], capture_output=True, text=True,
        cwd=REPO, timeout=1800, env=env,
    )
    assert r.returncode == 0, (r.stderr or r.stdout)[-2000:]
    assert "loss" in (r.stdout + r.stderr).lower()


@pytest.mark.level(0)
def test_documented_posttrain_commands_compose():
    """Every documented full-scale train command composes into a valid
    config (experiment resolves, every dotlist override lands on a real
    field) — the config-level half of docs-as-tests."""
    from cosmos_predict2_tpu.configs.defaults import make_config

    checked = 0
    for block in _doc_bash_blocks("post_training.md"):
        argv = _split_command(block)
        if "cosmos_predict2_tpu.training.train" not in " ".join(argv[:4]):
            continue
        experiment, overrides = None, []
        it = iter(argv)
        for tok in it:
            if tok.startswith("--experiment="):
                experiment = tok.split("=", 1)[1]
            elif tok == "--experiment":
                experiment = next(it)
            elif "=" in tok and not tok.startswith("-") and not tok.startswith("COSMOS"):
                overrides.append(tok)
        if experiment is None:
            continue
        cfg = make_config(experiment, overrides)
        assert cfg.job.name == experiment
        checked += 1
    assert checked >= 2, "expected at least the main + variant train commands"


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
