"""Round-4 conv micro: lowering variants for the decode's hot conv shapes.

The steady decode chunk spends ~80% of its FLOPs in 12 causal 3x3x3 convs
(6x [T6 352x640 192ch] + 6x [T6 704x1280 96ch]) plus 5x [T4 176x320
384ch] (see docs/PERF.md round-4 section; shapes traced from
decoder_chunk). XLA's 3D conv emitter reaches ~26 TF/s there. Variants:

  conv3d   — the XLA 3D conv (baseline, what "xla" routes)
  taps27   — 27 shifted GEMMs, f32 accum (the "taps" backend)
  t3conv2d — temporal decomposition: 3 shifted 2D convs accumulated
             (batch folds T_out) — tests whether the 2D emitter beats 3D
  pallas   — ops/conv3d.py implicit-GEMM kernel

Run on the chip: python scripts/vae_conv_micro4.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np

from cosmos_predict2_tpu.ops import conv3d as pc

# (T_in, H, W, Cin, Cout) — T_out = T_in - 2
SHAPES = [
    (6, 704, 1280, 96, 96),
    (6, 352, 640, 192, 192),
    (4, 176, 320, 384, 384),
]


def conv3d_xla(x, w, b):
    return pc.conv3d_causal_taps_reference(x, w, b)


def taps27(x, w, b):
    return pc.conv3d_causal_taps_xla(x, w, b)


def t3conv2d(x, w, b):
    """3 temporal taps as 2D convs over a folded (B*T_out) batch."""
    B, T_in, H, W, Cin = x.shape
    T = T_in - 2
    Cout = w.shape[-1]
    out = None
    for dt in range(3):
        xs = jax.lax.slice(x, (0, dt, 0, 0, 0), (B, dt + T, H, W, Cin)).reshape(B * T, H, W, Cin)
        o = jax.lax.conv_general_dilated(
            xs, w[dt], window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        out = o if out is None else out + o
    return (out + b.astype(jnp.float32)).reshape(B, T, H, W, Cout).astype(x.dtype)


def pallas(x, w, b):
    return pc.conv3d_causal_taps(x, w, b)


def pallas_kfold(x, w, b):
    return pc.conv3d_causal_folded(x, w, b)


VARIANTS = [
    ("conv3d", conv3d_xla),
    ("taps27", taps27),
    ("t3conv2d", t3conv2d),
    ("pallas", pallas),
    ("kfold", pallas_kfold),
]


def main():
    kind = jax.devices()[0].device_kind
    print(f"[chip] {kind}", flush=True)
    for (T_in, H, W, Cin, Cout) in SHAPES:
        T = T_in - 2
        flops = 2 * 27 * Cin * Cout * T * H * W
        x = jax.random.normal(jax.random.PRNGKey(0), (1, T_in, H, W, Cin), dtype=jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, Cin, Cout), dtype=jnp.bfloat16) * 0.05
        b = jnp.zeros((Cout,), dtype=jnp.float32)
        ref = None
        for name, fn in VARIANTS:
            try:
                jf = jax.jit(fn)
                out = jf(x, w, b)
                out.block_until_ready()
                if ref is None:
                    ref = np.asarray(out, dtype=np.float32)
                else:
                    err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
                    scale = float(np.max(np.abs(ref))) or 1.0
                    assert err / scale < 3e-2, f"{name} mismatch rel {err/scale:.3e}"
                times = []
                for _ in range(6):
                    t0 = time.perf_counter()
                    jf(x, w, b).block_until_ready()
                    times.append(time.perf_counter() - t0)
                t = float(np.min(times))
                print(
                    f"[{T_in}x{H}x{W}x{Cin}->{Cout}] {name:9s} t={t*1e3:7.1f} ms "
                    f"{flops/t/1e12:6.1f} TF/s",
                    flush=True,
                )
            except Exception as e:
                print(f"[{T_in}x{H}x{W}x{Cin}->{Cout}] {name:9s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
