"""3D video rotary position embeddings (RoPE), numerics-matched to the
reference ``VideoRopePosition3DEmb`` (minimal_v4_dit.py:539-667) and
TransformerEngine's ``apply_rotary_pos_emb`` (GPT-NeoX half-rotation).

Layout: per head_dim D, band sizes are
  dim_h = dim_w = D // 6 * 2;  dim_t = D - 2*dim_h
Frequencies per axis a: 1 / (theta_a ** (arange(0, dim_a, 2) / dim_a)) with
theta_a = 10000 * ntk_factor_a and ntk_factor_a = ratio ** (dim_a/(dim_a-2)).
The angle table is cat([t_band, h_band, w_band] * 2, -1) flattened over
(t h w) — i.e. the *same* half-frequencies repeated twice, which is exactly
the GPT-NeoX convention: rotate_half pairs element i with element i + D/2.

FPS modulation: temporal positions are scaled by base_fps / fps
(minimal_v4_dit.py:645-650); for image batches (T==1) no scaling.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RopeSpec:
    head_dim: int
    base_fps: float = 24.0
    h_extrapolation_ratio: float = 1.0
    w_extrapolation_ratio: float = 1.0
    t_extrapolation_ratio: float = 1.0
    enable_fps_modulation: bool = True

    @property
    def dim_h(self) -> int:
        return self.head_dim // 6 * 2

    @property
    def dim_t(self) -> int:
        return self.head_dim - 2 * self.dim_h


def _axis_freqs(dim: int, theta: float) -> np.ndarray:
    rng = np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim
    return 1.0 / (theta**rng)


@functools.partial(jax.jit, static_argnames=("spec", "T", "H", "W"))
def rope_angles_3d(
    spec: RopeSpec,
    T: int,
    H: int,
    W: int,
    fps: jax.Array | None = None,
    t_start: jax.Array | int = 0,
) -> jax.Array:
    """Angle table of shape (T*H*W, head_dim).

    Matches reference ``generate_embeddings``: positions arange(T/H/W),
    outer with per-axis freqs, broadcast to a (T, H, W, d_t/2+d_h/2+d_w/2)
    grid, then the whole band concatenated twice.
    """
    dim_h, dim_t = spec.dim_h, spec.dim_t
    h_theta = 10000.0 * spec.h_extrapolation_ratio ** (dim_h / (dim_h - 2))
    w_theta = 10000.0 * spec.w_extrapolation_ratio ** (dim_h / (dim_h - 2))
    t_theta = 10000.0 * spec.t_extrapolation_ratio ** (dim_t / (dim_t - 2))

    h_freqs = jnp.asarray(_axis_freqs(dim_h, h_theta), dtype=jnp.float32)
    w_freqs = jnp.asarray(_axis_freqs(dim_h, w_theta), dtype=jnp.float32)
    t_freqs = jnp.asarray(_axis_freqs(dim_t, t_theta), dtype=jnp.float32)

    t_pos = jnp.arange(T, dtype=jnp.float32) + jnp.asarray(t_start, dtype=jnp.float32)
    if spec.enable_fps_modulation and fps is not None and T > 1:
        t_pos = t_pos / fps.reshape(())[None] * spec.base_fps
    h_pos = jnp.arange(H, dtype=jnp.float32)
    w_pos = jnp.arange(W, dtype=jnp.float32)

    emb_t = jnp.einsum("t,d->td", t_pos, t_freqs)  # (T, dim_t/2)
    emb_h = jnp.einsum("h,d->hd", h_pos, h_freqs)  # (H, dim_h/2)
    emb_w = jnp.einsum("w,d->wd", w_pos, w_freqs)  # (W, dim_h/2)

    half = jnp.concatenate(
        [
            jnp.broadcast_to(emb_t[:, None, None, :], (T, H, W, emb_t.shape[-1])),
            jnp.broadcast_to(emb_h[None, :, None, :], (T, H, W, emb_h.shape[-1])),
            jnp.broadcast_to(emb_w[None, None, :, :], (T, H, W, emb_w.shape[-1])),
        ],
        axis=-1,
    )  # (T, H, W, head_dim/2)
    angles = jnp.concatenate([half, half], axis=-1)  # (T, H, W, head_dim)
    return angles.reshape(T * H * W, spec.head_dim)


def apply_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Apply RoPE with GPT-NeoX half-rotation (TE convention).

    x: (..., S, n_heads, D); angles: (S, D) fp32.
    rotate_half(x) = cat(-x2, x1) with x1, x2 the two halves of D.
    Computed in fp32 (TE casts freqs to fp32 internally), cast back.
    """
    d = x.shape[-1]
    cos = jnp.cos(angles).astype(jnp.float32)
    sin = jnp.sin(angles).astype(jnp.float32)
    # broadcast angles over leading dims and the head axis: (S, 1, D)
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos + rotated * sin).astype(x.dtype)
