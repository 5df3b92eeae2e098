"""Compare XLA memory analysis of the steady decode chunk: fused vs naive
upsample-conv. Compile-only (no execution), prints peak/temp/argument bytes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax.numpy as jnp


def main():
    from cosmos_predict2_tpu.tokenizers import wan_vae, wan_vae_streaming as wvs
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig

    cfg = WanVAEConfig(dtype=jnp.bfloat16)
    net = WanVAE(cfg)
    shapes = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 64, 64, 3), jnp.bfloat16)))
    params = jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), shapes)
    z = jax.ShapeDtypeStruct((1, 1, 88, 160, 16), jnp.bfloat16)
    state = jax.eval_shape(lambda: wvs.init_decoder_state(cfg, 1, 88, 160, dtype=cfg.dtype).caches)

    naive = sys.argv[1:] and sys.argv[1] == "naive"
    if naive:
        def unfused(w, b, x, dtype):
            up = wan_vae._nearest_upsample2x(x)
            B, T = up.shape[:2]
            xf = up.reshape((B * T,) + up.shape[2:]).astype(dtype)
            out = jax.lax.conv_general_dilated(
                xf, w.astype(dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=dtype)
            return (out + b.astype(dtype)).reshape((B, T) + out.shape[1:])
        wvs._upsample2x_conv3x3 = unfused
        wvs._JIT_CACHE.clear()

    fn = wvs._jitted_chunk("dec", cfg, first=False)
    compiled = fn.lower(params, z, state).compile()
    ma = compiled.memory_analysis()
    label = "naive" if naive else "fused"
    print(f"[{label}] temp={ma.temp_size_in_bytes/2**30:.2f} GiB  "
          f"args={ma.argument_size_in_bytes/2**30:.2f} GiB  "
          f"out={ma.output_size_in_bytes/2**30:.2f} GiB  "
          f"gen={ma.generated_code_size_in_bytes/2**20:.1f} MiB", flush=True)


if __name__ == "__main__":
    main()
