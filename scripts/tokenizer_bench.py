"""Tokenizer (video VAE) micro-benchmark.

Parity with the reference harness (predict2/utils/tokenizer_benchmarking.py
+ the BenchmarkTimes counters inside WanVAE, wan2pt1.py:817-880): times
encode and decode of the Wan2.1 VAE at a chosen clip geometry on the
current backend, printing ms and pixels/s.

    python scripts/tokenizer_bench.py [--frames 17] [--size 480 832] [--dim 96]
"""

import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--size", type=int, nargs=2, default=(480, 832))
    ap.add_argument("--dim", type=int, default=96)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig

    H, W = args.size
    cfg = WanVAEConfig(dim=args.dim, dtype=jnp.bfloat16)
    vae = WanVAE(cfg)
    clip = jax.random.uniform(jax.random.PRNGKey(0), (1, args.frames, H, W, 3), minval=-1, maxval=1)
    params = vae.init(jax.random.PRNGKey(1), clip[:, :1])

    enc = jax.jit(lambda p, x: vae.apply(p, x, method=WanVAE.encode))
    z = jax.block_until_ready(enc(params, clip))
    dec = jax.jit(lambda p, x: vae.apply(p, x, method=WanVAE.decode))
    rec = jax.block_until_ready(dec(params, z))
    assert rec.shape == clip.shape

    px = args.frames * H * W

    def timeit(f, *xs):
        # host readback per iter: block_until_ready is unreliable through
        # remote-backend tunnels, a scalar readback is not
        float(jnp.sum(f(*xs)[0, 0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = float(jnp.sum(f(*xs)[0, 0, 0, 0]))
        return (time.perf_counter() - t0) / args.iters

    te = timeit(enc, params, clip)
    td = timeit(dec, params, z)
    print(f"backend={jax.default_backend()} clip={args.frames}x{H}x{W} latent={tuple(z.shape)}")
    print(f"encode: {te*1e3:8.2f} ms   {px/te/1e6:8.1f} Mpx/s")
    print(f"decode: {td*1e3:8.2f} ms   {px/td/1e6:8.1f} Mpx/s")


if __name__ == "__main__":
    main()
