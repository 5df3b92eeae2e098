"""Microbench: causal 3x3x3 conv3d vs equivalent temporal-im2col conv2d.

A causal k_t=3 conv over (B,T,H,W,C) is exactly a 2D 3x3 conv over
(B*T,H,W,3C) where the 3C input channels are the three temporal taps
(x[t-2], x[t-1], x[t]).  XLA's TPU conv emitter is tuned for 2D; this
quantifies what the 3D lowering costs at each decoder stage shape.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


from functools import partial  # noqa: E402

from cosmos_predict2_tpu.utils.benchmarking import timed as _timed  # noqa: E402

timed = partial(_timed, iters=5)


def conv3d(w, b, x):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), preferred_element_type=jnp.bfloat16,
    )
    return out + b


def conv2d_im2col(w2, b, x):
    # x: (B, T+2, H, W, C) pre-padded in time; stack 3 taps into channels
    B, Tp, H, W, C = x.shape
    T = Tp - 2
    taps = jnp.concatenate([x[:, 0:T], x[:, 1:T + 1], x[:, 2:T + 2]], axis=-1)
    xf = taps.reshape(B * T, H, W, 3 * C)
    out = jax.lax.conv_general_dilated(
        xf, w2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.bfloat16,
    )
    return (out + b).reshape(B, T, H, W, -1)


def main():
    shapes = [
        (1, 4, 704, 1280, 96, 96),
        (1, 4, 352, 640, 192, 192),
        (1, 2, 352, 640, 384, 192),
        (1, 2, 176, 320, 384, 384),
        (1, 1, 88, 160, 384, 384),
    ]
    for (B, T, H, W, Ci, Co) in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, T + 2, H, W, Ci), dtype=jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 3, Ci, Co), dtype=jnp.bfloat16) * 0.05
        b = jnp.zeros((Co,), jnp.bfloat16)
        # identical math: w2[(kh,kw),3C,Co] where tap kt maps to channel block kt
        w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * Ci, Co)

        f3 = jax.jit(lambda x, w=w, b=b: conv3d(w, b, x))
        f2 = jax.jit(lambda x, w2=w2, b=b: conv2d_im2col(w2, b, x))
        # numerics check
        o3, o2 = f3(x), f2(x)
        err = float(jnp.max(jnp.abs(o3.astype(jnp.float32) - o2.astype(jnp.float32))))
        t3, t2 = timed(f3, x), timed(f2, x)
        fl = 2 * B * T * H * W * 27 * Ci * Co
        print(
            f"[{B}x{T}x{H}x{W} {Ci}->{Co}] conv3d {t3*1e3:7.1f} ms ({fl/t3/1e12:5.1f} TF/s) | "
            f"im2col2d {t2*1e3:7.1f} ms ({fl/t2/1e12:5.1f} TF/s) | speedup {t3/t2:.2f}x | maxerr {err:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
