"""Second round of conv lowering experiments for the VAE decoder stages."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


from functools import partial  # noqa: E402

from cosmos_predict2_tpu.utils.benchmarking import timed as _timed  # noqa: E402

timed = partial(_timed, iters=5)


def main():
    # dispatch-overhead floor through the tunnel
    tiny = jax.jit(lambda x: x + 1.0)
    x0 = jnp.ones((8, 128), jnp.bfloat16)
    print(f"[floor] trivial dispatch+sync: {timed(tiny, x0)*1e3:.1f} ms", flush=True)

    B, T, H, W, Ci, Co = 1, 4, 704, 1280, 96, 96
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T + 2, H, W, Ci), dtype=jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, Ci, Co), dtype=jnp.bfloat16) * 0.05
    fl = 2 * B * T * H * W * 27 * Ci * Co

    def report(name, fn, *args):
        t = timed(fn, *args)
        print(f"[{name}] {t*1e3:7.1f} ms  ({fl/t/1e12:5.1f} TF/s)", flush=True)

    # 1. baseline conv3d bf16
    f1 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), preferred_element_type=jnp.bfloat16))
    report("conv3d bf16", f1, x, w)

    # 2. conv3d f32 accum
    f2 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), preferred_element_type=jnp.float32))
    report("conv3d f32acc", f2, x, w)

    # 3. channels padded to 128 (i/o)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 32)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 32), (0, 32)))
    f3 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), preferred_element_type=jnp.bfloat16))
    report("conv3d pad128", f3, xp, wp)

    # 4. three 1x3x3 conv2d taps summed
    def taps2d(x, w):
        T_ = x.shape[1] - 2
        outs = 0
        for kt in range(3):
            xf = x[:, kt:kt + T_].reshape(B * T_, H, W, Ci)
            outs = outs + jax.lax.conv_general_dilated(
                xf, w[kt], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.bfloat16)
        return outs
    report("3x conv2d taps", jax.jit(taps2d), x, w)

    # 5. NCHW-style layout (feature-major)
    xc = jnp.transpose(x, (0, 4, 1, 2, 3))  # NCDHW
    f5 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NCDHW", "DHWIO", "NCDHW"), preferred_element_type=jnp.bfloat16))
    report("conv3d NCDHW", f5, xc, w)

    # 6. batch the temporal taps as groups: fold T into N, depth=3 window stays
    #    (same op, but let XLA see batch=4 2D-ish problem): unroll T
    def unrollT(x, w):
        outs = []
        for t in range(T):
            xt = x[:, t:t + 3]  # (B,3,H,W,C)
            o = jax.lax.conv_general_dilated(
                xt, w, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), preferred_element_type=jnp.bfloat16)
            outs.append(o)
        return jnp.concatenate(outs, axis=1)
    report("conv3d unrollT", jax.jit(unrollT), x, w)

    # 7. big-batch 2D: all 27 taps as one dot_general (explicit im2col matmul)
    def im2col_mm(x, w):
        T_ = x.shape[1] - 2
        xpad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        cols = []
        for kt in range(3):
            for kh in range(3):
                for kw in range(3):
                    cols.append(xpad[:, kt:kt + T_, kh:kh + H, kw:kw + W, :])
        patches = jnp.concatenate(cols, axis=-1)  # (B,T,H,W,27C)
        wm = w.reshape(27 * Ci, Co)
        return jax.lax.dot_general(
            patches.reshape(-1, 27 * Ci), wm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16)
    report("im2col matmul", jax.jit(im2col_mm), x, w)


if __name__ == "__main__":
    main()
