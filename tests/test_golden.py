"""Golden-value regressions: pin exact numerics of the core compute paths
so refactors cannot silently change them (the reference pins training-loss
values the same way, predict2/tests/training_loss_test.py:42-45).

Golden values are generated once (tests/golden/) from fixed seeds; the
test regenerates the inputs and compares against the stored outputs.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _dit_output():
    import dataclasses

    from cosmos_predict2_tpu.networks.dit import MiniTrainDIT, PRESETS

    cfg = dataclasses.replace(PRESETS["test"], dtype=jnp.float32, remat="none")
    net = MiniTrainDIT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 16, 2, 8, 8))
    ts = jnp.full((1,), 700.0)
    ctx = jax.random.normal(jax.random.PRNGKey(12), (1, 8, 1024)) * 0.05
    params = net.init(jax.random.PRNGKey(13), x, ts, ctx)
    return np.asarray(net.apply(params, x, ts, ctx))


def _unipc_output():
    from cosmos_predict2_tpu.schedulers import unipc

    coeffs = unipc.set_timesteps(8, shift=5.0)
    target = jnp.asarray(np.random.RandomState(7).randn(2, 6), dtype=jnp.float32)

    def vel(x, t):
        return (x - target) / (t / 1000.0) + 0.05 * x  # slightly non-exact field

    x0 = jax.random.normal(jax.random.PRNGKey(14), (2, 6))
    return np.asarray(unipc.sample(vel, x0, coeffs))


CASES = {"dit_forward": _dit_output, "unipc_sample": _unipc_output}


@pytest.mark.level(1)
@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    got = CASES[name]()
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path, value=got)
        pytest.skip(f"golden value for {name} created; rerun to verify")
    expected = np.load(path)["value"]
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.level(1)
def test_activation_dump_and_compare(tmp_path):
    import dataclasses

    from cosmos_predict2_tpu.networks.dit import MiniTrainDIT, PRESETS
    from cosmos_predict2_tpu.utils.golden_activations import (
        compare_activation_dumps,
        dump_dit_activations,
    )

    net = MiniTrainDIT(dataclasses.replace(PRESETS["test"], dtype=jnp.float32, remat="none"))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 4, 4))
    ts = jnp.full((1,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 1024)) * 0.05
    params = net.init(jax.random.PRNGKey(2), x, ts, ctx)

    p1, p2 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    arrays = dump_dit_activations(net, params, x, ts, ctx, p1)
    assert set(arrays) == {"block_00", "block_01", "output", "input"}
    dump_dit_activations(net, params, x, ts, ctx, p2)
    diffs = compare_activation_dumps(p1, p2)
    assert all(d.max_abs == 0.0 for d in diffs)  # deterministic reruns

    # a perturbed dump is flagged, worst first
    perturbed = {k: v + (0.1 if k == "block_01" else 0.0) for k, v in arrays.items()}
    np.savez_compressed(p2, **perturbed)
    diffs = compare_activation_dumps(p1, p2)
    assert diffs[0].name == "block_01" and diffs[0].max_abs > 0.09
