"""Legacy EDM model + Karras 2ab sampler tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.conditioning.conditioner import make_condition
from cosmos_predict2_tpu.models.edm import EDMModelConfig, EDMVideo2WorldModel
from cosmos_predict2_tpu.models.video2world import RFModelConfig
from cosmos_predict2_tpu.networks.dit import PRESETS
from cosmos_predict2_tpu.schedulers import edm_sampler


@pytest.mark.level(0)
def test_karras_schedule():
    s = edm_sampler.karras_rev_ts(0.002, 80.0, 10, 7.0)
    assert s[0] == pytest.approx(80.0) and s[-1] == pytest.approx(0.002)
    assert np.all(np.diff(s) < 0)


@pytest.mark.level(0)
def test_edm_scalings():
    sd = 0.5
    sigma = jnp.asarray([1.0])
    c_skip, c_out, c_in, c_noise = edm_sampler.edm_scalings(sigma, sd)
    np.testing.assert_allclose(float(c_skip[0]), sd**2 / (1 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(float(c_out[0]), sd / np.sqrt(1 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(float(c_noise[0]), 0.0, atol=1e-7)
    # boundary identity: c_skip^2 + c_out^2/sd^2 ... (variance preservation)
    np.testing.assert_allclose(float(c_in[0]), 1 / np.sqrt(1 + sd**2), rtol=1e-6)


@pytest.mark.level(0)
def test_sampler_exact_on_point_mass():
    """x0_fn = constant target: both euler and 2ab steps must land exactly."""
    target = jnp.asarray(np.random.RandomState(0).randn(2, 4), dtype=jnp.float32)

    def x0_fn(x, sigma):
        return jnp.broadcast_to(target, x.shape)

    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    out = edm_sampler.sample(x0_fn, noise * 80.0, num_steps=10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-4)


@pytest.mark.level(0)
def test_sampler_linear_ode_convergence():
    """Exact linear score model: x0(x, sigma) = x/(1+sigma^2) (unit gaussian
    data). The sampler must converge to the analytic flow solution
    x(sigma)=x(sigma_max)*sqrt((1+sigma^2)/(1+sigma_max^2)) as steps grow."""
    def x0_fn(x, sigma):
        return x / (1 + sigma**2)

    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 8))
    sigma_max = 80.0
    x_init = noise * sigma_max
    out = edm_sampler.sample(x0_fn, x_init, num_steps=60, sample_clean=False)
    expected = np.asarray(x_init) * np.sqrt((1 + 0.002**2) / (1 + sigma_max**2))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-2)


@pytest.mark.level(1)
def test_edm_model_train_and_generate():
    net = dataclasses.replace(PRESETS["test"], dtype=jnp.float32, remat="none")
    model = EDMVideo2WorldModel(EDMModelConfig(model=RFModelConfig(net=net, state_t=2)))
    shape = (1, 16, 2, 8, 8)
    params = model.init_params(jax.random.PRNGKey(0), shape, text_len=8)
    x0 = jax.random.normal(jax.random.PRNGKey(1), shape) * 0.5
    cond = make_condition(jax.random.normal(jax.random.PRNGKey(2), (1, 8, 1024)) * 0.05).replace(gt_frames=x0)
    loss, _ = jax.jit(model.training_step)(params, jax.random.PRNGKey(3), x0, cond)
    assert np.isfinite(float(loss))
    noise = jax.random.normal(jax.random.PRNGKey(4), shape)
    out = jax.jit(lambda p, n: model.generate(p, n, cond, guidance=2.0, num_steps=4))(params, noise)
    assert np.isfinite(np.asarray(out)).all()
    # conditional frame pinned
    np.testing.assert_allclose(np.asarray(out[:, :, 0]), np.asarray(x0[:, :, 0]), atol=1e-4)
