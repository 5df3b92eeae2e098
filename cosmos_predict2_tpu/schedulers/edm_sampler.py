"""EDM (Karras) sampler with the "2ab" Adams-Bashforth multistep solver.

Capability parity with the reference legacy sampler stack
(cosmos_predict2/_src/common/modules/res_sampler.py:108-300 +
imaginaire/functional/{multi_step,runge_kutta}.py): Karras rho-spaced
sigmas, optional S_churn noise injection, order-2 exponential-integrator
multistep updates (res_x0_rk2_step with phi1/phi2), and the final
sample_clean denoise.

TPU-native shape: all per-step scalar coefficients depend only on the
host-known sigma schedule, so they are precomputed in float64 NumPy and the
loop is a single ``lax.scan`` carrying (x, x0_prev) — same design as the
UniPC sampler.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def karras_rev_ts(sigma_min: float = 0.002, sigma_max: float = 80.0, num_steps: int = 35, rho: float = 7.0) -> np.ndarray:
    """Reverse (descending) Karras schedule (res_sampler.get_rev_ts :71-105)."""
    idx = np.arange(num_steps + 1, dtype=np.float64)
    return (sigma_max ** (1 / rho) + idx / num_steps * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho


def _phi1(t: float) -> float:
    return math.expm1(t) / t if t != 0 else 1.0


def _phi2(t: float) -> float:
    return (_phi1(t) - 1.0) / t if t != 0 else 0.5


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EDMCoeffs:
    sigmas: jnp.ndarray  # (n+1,)
    # euler fallback (step 0): x' = a_e*x0 + b_e*x
    a_e: jnp.ndarray
    b_e: jnp.ndarray
    # 2ab step: x' = exp(-dt)*x + dt*(b1*x0_s + b2*x0_prev)
    exp_ndt: jnp.ndarray
    b1dt: jnp.ndarray
    b2dt: jnp.ndarray

    def tree_flatten(self):
        return (self.sigmas, self.a_e, self.b_e, self.exp_ndt, self.b1dt, self.b2dt), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_steps(self):
        return self.a_e.shape[0]


def make_coeffs(sigmas: np.ndarray) -> EDMCoeffs:
    n = len(sigmas) - 1
    a_e = np.zeros(n)
    b_e = np.zeros(n)
    exp_ndt = np.zeros(n)
    b1dt = np.zeros(n)
    b2dt = np.zeros(n)
    lam = -np.log(sigmas)
    for i in range(n):
        s, t = sigmas[i], sigmas[i + 1]
        a_e[i] = (s - t) / s
        b_e[i] = t / s
        if i > 0:
            m = sigmas[i - 1]
            dt = lam[i + 1] - lam[i]
            c2 = (lam[i - 1] - lam[i]) / dt
            p1, p2 = _phi1(-dt), _phi2(-dt)
            b1 = p1 - p2 / c2
            b2 = p2 / c2
            exp_ndt[i] = math.exp(-dt)
            b1dt[i] = dt * b1
            b2dt[i] = dt * b2
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return EDMCoeffs(f32(sigmas), f32(a_e), f32(b_e), f32(exp_ndt), f32(b1dt), f32(b2dt))


def sample(
    x0_fn: Callable[[jax.Array, jax.Array], jax.Array],
    x_sigma_max: jax.Array,
    num_steps: int = 35,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    s_churn: float = 0.0,
    s_noise: float = 1.0,
    rng: Optional[jax.Array] = None,
    sample_clean: bool = True,
) -> jax.Array:
    """Run the 2ab multistep EDM sampler as one lax.scan.

    x0_fn(x, sigma_scalar) -> x0 prediction (CFG composed inside).
    x_sigma_max: initial state at sigma_max (i.e. noise * sigma_max).
    """
    sigmas = karras_rev_ts(sigma_min, sigma_max, num_steps, rho)
    coeffs = make_coeffs(sigmas)
    n = coeffs.num_steps
    eta = min(s_churn / (n + 1), math.sqrt(1.2) - 1)
    use_churn = s_churn > 0 and rng is not None

    def step(carry, per_step):
        x, x0_prev, rng_i = carry
        i, sigma_cur, a_e, b_e, exp_ndt, b1dt, b2dt = per_step
        if use_churn:
            rng_i, sub = jax.random.split(rng_i)
            hat_sigma = sigma_cur + eta * sigma_cur
            x = x + jnp.sqrt(hat_sigma**2 - sigma_cur**2) * s_noise * jax.random.normal(sub, x.shape, x.dtype)
            sigma_cur = hat_sigma
        x0 = x0_fn(x, sigma_cur)
        euler = a_e * x0 + b_e * x
        ab2 = exp_ndt * x + b1dt * x0 + b2dt * x0_prev
        x_next = jnp.where(i == 0, euler, ab2)
        return (x_next, x0, rng_i), None

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    per_step = (
        jnp.arange(n),
        coeffs.sigmas[:n],
        coeffs.a_e,
        coeffs.b_e,
        coeffs.exp_ndt,
        coeffs.b1dt,
        coeffs.b2dt,
    )
    (x, _, _), _ = jax.lax.scan(step, (x_sigma_max.astype(jnp.float32), jnp.zeros_like(x_sigma_max, dtype=jnp.float32), rng), per_step)
    if sample_clean:
        x = x0_fn(x, coeffs.sigmas[-1])
    return x


def edm_scalings(sigma: jax.Array, sigma_data: float = 0.5):
    """EDM preconditioning (Karras et al. 2022, used by the legacy
    DiffusionModel, _src/common/modules/denoiser_scaling.py)."""
    c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)
    c_out = sigma * sigma_data * jax.lax.rsqrt(sigma**2 + sigma_data**2)
    c_in = jax.lax.rsqrt(sigma**2 + sigma_data**2)
    c_noise = 0.25 * jnp.log(sigma)
    return c_skip, c_out, c_in, c_noise
