"""Third round of conv lowering experiments: tap-decomposed GEMM forms.

The decode ceiling is XLA's conv emitter (26 TF/s, 13% MXU at full scale
— PERF.md "VAE roofline"). The Pallas implicit-GEMM kernel beats it per
conv but loses the host-spool overlap (pallas_call programs don't overlap
the async D2H pulls), so the production overlapped route still pins the
XLA conv. This script tests PURE-XLA tap decompositions — if one of them
reaches Pallas speed it wins twice (kernel + keeps the overlap):

  8.  tap-sum GEMM: y = sum_{27 taps} shift(x) @ W[tap] — 27 plain
      (B*T*H*W, Ci) x (Ci, Co) dots, accumulated; nothing bigger than x
      is materialized (vs im2col's 27C patch tensor).
  9.  w-grouped tap-sum: taps grouped along W into K=3*Ci GEMMs (9 dots,
      one materialized 3C-concat per (kt,kh) pair).
  10. row-shift GEMM: like 8 but the W-shift is a roll (no pad copy).
  11. f32-accumulated variant of 8 (does accum dtype change the emitter?)

Run on chip per stage shape:  python scripts/vae_conv_micro3.py
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np

from cosmos_predict2_tpu.utils.benchmarking import timed as _timed  # noqa: E402

timed = partial(_timed, iters=5)

# decoder stage shapes of one steady streaming chunk (1 latent frame):
# (T includes the temporal-cache context frames the conv actually sees)
STAGES = [
    # (T_out, H, W, Ci, Co)   stage
    (1, 88, 160, 384, 384),  # mid / up0 resblocks (latent res)
    (2, 176, 320, 384, 384),  # after 1st upsample (+temporal x2)
    (4, 352, 640, 192, 192),  # after 2nd upsample (+temporal x2)
    (4, 704, 1280, 96, 96),  # final res
]


def conv_ref(x, w):
    """Causal 3D conv, valid-T (input already carries 2 context frames)."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.bfloat16,
    )


def tap_sum(x, w, accum=jnp.bfloat16):
    """27 shifted GEMMs accumulated; x: (B, T+2, H, W, Ci)."""
    B, Tp2, H, W, Ci = x.shape
    T = Tp2 - 2
    xpad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for kt in range(3):
        for kh in range(3):
            for kw in range(3):
                xs = jax.lax.slice(
                    xpad, (0, kt, kh, kw, 0), (B, kt + T, kh + H, kw + W, Ci)
                )
                o = jax.lax.dot_general(
                    xs.reshape(-1, Ci), w[kt, kh, kw],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=accum,
                )
                out = o if out is None else out + o
    return out.astype(jnp.bfloat16).reshape(B, T, H, W, w.shape[-1])


def tap_sum_wgroup(x, w):
    """9 GEMMs with K=3*Ci: W-axis taps concatenated per (kt, kh)."""
    B, Tp2, H, W, Ci = x.shape
    T = Tp2 - 2
    xpad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for kt in range(3):
        for kh in range(3):
            xs = jax.lax.slice(xpad, (0, kt, kh, 0, 0), (B, kt + T, kh + H, W + 2, Ci))
            cols = jnp.concatenate(
                [xs[:, :, :, kw:kw + W, :] for kw in range(3)], axis=-1
            )  # (B,T,H,W,3Ci)
            wm = jnp.concatenate([w[kt, kh, kw] for kw in range(3)], axis=0)  # (3Ci,Co)
            o = jax.lax.dot_general(
                cols.reshape(-1, 3 * Ci), wm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            out = o if out is None else out + o
    return out.reshape(B, T, H, W, w.shape[-1])


def main():
    for T, H, W, Ci, Co in STAGES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, T + 2, H, W, Ci), dtype=jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 3, Ci, Co), dtype=jnp.bfloat16) * (Ci ** -0.5)
        fl = 2 * T * H * W * 27 * Ci * Co
        print(f"\n== stage T{T} {H}x{W} {Ci}->{Co}  ({fl/1e9:.1f} GF)", flush=True)

        # numerics check (CPU-safe, small slab)
        ref = np.asarray(conv_ref(x[:, :, :16, :32], w), np.float32)
        got = np.asarray(tap_sum(x[:, :, :16, :32], w), np.float32)
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
        assert err < 2e-2, f"tap_sum mismatch {err}"

        def report(name, fn):
            try:
                t = timed(jax.jit(fn), x, w)
                print(f"  [{name:16s}] {t*1e3:8.1f} ms  ({fl/t/1e12:5.1f} TF/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  [{name:16s}] FAILED {type(e).__name__}: {str(e)[:80]}", flush=True)

        report("conv3d (XLA)", conv_ref)
        report("tap_sum bf16", tap_sum)
        report("tap_sum f32acc", lambda x, w: tap_sum(x, w, accum=jnp.float32))
        report("tap_wgroup", tap_sum_wgroup)


if __name__ == "__main__":
    main()
