"""UniPC sampler tests.

The coefficient precomputation is validated two ways:
1. against a stateful step-by-step NumPy oracle that follows the reference
   scheduler's control flow (fm_solvers_unipc.py:630-712) literally;
2. analytically: flow-matching from a point-mass data distribution has a
   velocity field linear in x, so the solver must recover the data almost
   exactly from any noise sample.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.schedulers import unipc
from cosmos_predict2_tpu.schedulers.rectified_flow import RectifiedFlow, RectifiedFlowConfig


def _oracle_unipc(velocity_fn, x, sigmas, solver_order=2):
    """Literal stateful re-derivation of the reference UniPC loop in NumPy."""
    n = len(sigmas) - 1
    model_outputs = [None] * solver_order
    lower_order_nums = 0
    last_sample = None
    this_order = None

    def lam(s):
        return np.inf if s <= 0 else np.log(1 - s) - np.log(s)

    def bh(h, o):
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = np.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1
        b = []
        fact = 1
        for k in range(1, o + 1):
            b.append(h_phi_k * fact / B_h)
            fact *= k + 1
            h_phi_k = h_phi_k / hh - 1 / fact
        return h_phi_1, B_h, np.array(b)

    for i in range(n):
        # the model sees int64-truncated timesteps (reference set_timesteps)
        v = velocity_fn(x, np.floor(sigmas[i] * 1000.0))
        x0 = x - sigmas[i] * v
        use_corr = i > 0 and last_sample is not None
        if use_corr:
            o = this_order
            sig_t, sig_s0 = sigmas[i], sigmas[i - 1]
            h = lam(sig_t) - lam(sig_s0)
            alpha_t = 1 - sig_t
            m0 = model_outputs[-1]
            rks, D1s = [], []
            for j in range(1, o):
                si = i - (j + 1)
                rk = (lam(sigmas[si]) - lam(sig_s0)) / h
                rks.append(rk)
                D1s.append((model_outputs[-(j + 1)] - m0) / rk)
            rks.append(1.0)
            h_phi_1, B_h, b = bh(h, o)
            R = np.stack([np.power(np.array(rks), k) for k in range(o)])
            rhos_c = np.array([0.5]) if o == 1 else np.linalg.solve(R, b)
            x_t_ = sig_t / sig_s0 * last_sample - alpha_t * h_phi_1 * m0
            corr = sum(rhos_c[j] * D1s[j] for j in range(len(D1s))) if D1s else 0
            x = x_t_ - alpha_t * B_h * (corr + rhos_c[-1] * (x0 - m0))
        model_outputs = model_outputs[1:] + [x0]
        this_order = min(min(solver_order, n - i), lower_order_nums + 1)
        last_sample = x
        # predictor
        o = this_order
        sig_t, sig_s0 = sigmas[i + 1], sigmas[i]
        h = lam(sig_t) - lam(sig_s0)
        alpha_t = 1 - sig_t
        m0 = model_outputs[-1]
        rks, D1s = [], []
        for j in range(1, o):
            si = i - j
            rk = (lam(sigmas[si]) - lam(sig_s0)) / h
            rks.append(rk)
            D1s.append((model_outputs[-(j + 1)] - m0) / rk)
        rks.append(1.0)
        h_phi_1, B_h, b = bh(h, o)
        R = np.stack([np.power(np.array(rks), k) for k in range(o)])
        if D1s:
            rhos_p = np.array([0.5]) if o == 2 else np.linalg.solve(R[:-1, :-1], b[:-1])
            pred = sum(rhos_p[j] * D1s[j] for j in range(len(D1s)))
        else:
            pred = 0
        x = sig_t / sig_s0 * x - alpha_t * h_phi_1 * m0 - alpha_t * B_h * pred
        lower_order_nums = min(lower_order_nums + 1, solver_order)
    return x


@pytest.mark.level(0)
@pytest.mark.parametrize("num_steps", [4, 10, 35])
def test_scan_matches_stateful_oracle(num_steps):
    coeffs = unipc.set_timesteps(num_steps, shift=5.0)
    rng = np.random.RandomState(0)
    target = rng.randn(2, 4).astype(np.float64)

    def vel_np(x, t):
        sigma = t / 1000.0
        # point-mass velocity: v = (x - x1)/sigma
        return (x - target) / sigma

    x0 = rng.randn(2, 4)
    expected = _oracle_unipc(vel_np, x0.copy(), np.asarray(coeffs.sigmas, dtype=np.float64))

    def vel_jax(x, t):
        return (x - jnp.asarray(target)) / (t / 1000.0)

    got = unipc.sample(vel_jax, jnp.asarray(x0, dtype=jnp.float32), coeffs)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-4)


@pytest.mark.level(0)
def test_point_mass_recovery():
    """Exact-velocity sampling must land on the data point."""
    coeffs = unipc.set_timesteps(20, shift=5.0)
    target = jnp.asarray(np.random.RandomState(1).randn(3, 8), dtype=jnp.float32)

    def vel(x, t):
        return (x - target) / (t / 1000.0)

    x0 = jax.random.normal(jax.random.PRNGKey(0), target.shape)
    out = unipc.sample(vel, x0, coeffs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=5e-3)


@pytest.mark.level(0)
def test_sigma_schedule_values():
    """Pin the shifted schedule: sigma'_i = 5 s / (1 + 4 s), with the base
    linspace spanning [1 - 1/N, 0] like the reference init schedule
    (fm_solvers_unipc.py:100-123; verified against the actual torch
    reference in tests/test_reference_parity.py)."""
    coeffs = unipc.set_timesteps(5, shift=5.0)
    base = np.linspace(1.0 - 1e-3, 0.0, 6)[:-1]
    expected = 5 * base / (1 + 4 * base)
    np.testing.assert_allclose(np.asarray(coeffs.sigmas[:-1]), expected, rtol=1e-6)
    assert coeffs.sigmas[-1] == 0.0
    # model-facing timesteps are int64-truncated like the reference
    np.testing.assert_allclose(np.asarray(coeffs.timesteps), np.floor(expected * 1000), rtol=1e-6)


@pytest.mark.level(0)
def test_karras_schedule():
    coeffs = unipc.set_timesteps(4, use_karras_sigma=True)
    # 5 active sigmas (num_steps+1), all in (0, 1), descending
    s = np.asarray(coeffs.sigmas)
    assert len(s) == 6 and s[-1] == 0.0
    assert np.all(np.diff(s[:-1]) < 0)
    assert s[0] == pytest.approx(200 / 201, rel=1e-5)


@pytest.mark.level(0)
def test_rectified_flow_interpolation():
    rf = RectifiedFlow(RectifiedFlowConfig(shift=5.0))
    x0 = jnp.ones((2, 3))  # noise
    x1 = jnp.zeros((2, 3))  # data
    t = jnp.asarray([0.25, 1.0])
    xt, v = rf.get_interpolation(x0, x1, t)
    np.testing.assert_allclose(np.asarray(xt[0]), 0.25)
    np.testing.assert_allclose(np.asarray(xt[1]), 1.0)
    np.testing.assert_allclose(np.asarray(v), 1.0)
    # discretize: u=0 -> first timestep (sigma_max)
    ts, sig = rf.discretize(jnp.asarray([0.0]))
    assert sig[0] == pytest.approx(rf.sigmas[0])
