"""Optimizer/EMA/data-feed overhead around the training step (VERDICT r2 #3).

The fwd+bwd step is compute-bound (scripts/train_step_bench.py); the
AdamW+EMA update and the host->device batch feed are bandwidth-bound.
This measures both so the training-step table can state the overheads
instead of asserting they are "trivial":

  * AdamW(+power-EMA) update on an N-parameter bf16 tree with f32
    moments, reported as achieved HBM GB/s and extrapolated linearly in
    bytes to the 2B model (the 2B's own f32 moments = 16 GiB exceed a
    16 GB chip solo — the reference holds them FSDP-sharded across 8x80GB
    GPUs, SURVEY §2.9; per-chip bytes shrink by the fsdp degree, so the
    per-chip overhead at scale is <= the extrapolation shown here / fsdp).
  * host->device transfer of one post-training video batch
    (uint8 17f 512x832), the data-feed cost an overlap-free loop pays.

Run: python scripts/opt_overhead_bench.py [n_params_millions]
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
import optax

from cosmos_predict2_tpu.training.ema import ema_update, power_ema_beta


from cosmos_predict2_tpu.utils.benchmarking import sync as _sync  # noqa: E402


def main() -> None:
    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    n = n_m * 1_000_000
    # one flat vector models the 2B tree's bandwidth profile: the update is
    # elementwise, so shape structure is irrelevant to bytes moved
    params = jnp.ones((n,), jnp.bfloat16) * 0.01
    grads = jnp.full((n,), 1e-4, jnp.bfloat16)
    ema = params.astype(jnp.bfloat16)

    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = tx.init(params)

    @jax.jit
    def update(params, ema, opt_state, grads, step):
        updates, opt_state = tx.update(grads.astype(jnp.float32), opt_state, params)
        params = optax.apply_updates(params, updates).astype(jnp.bfloat16)
        ema = ema_update(ema, params, power_ema_beta(step, s=0.1))
        return params, ema, opt_state

    out = update(params, ema, opt_state, grads, jnp.int32(100))
    _sync(out)
    laps = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = update(params, ema, opt_state, grads, jnp.int32(100))
        _sync(out)
        laps.append(time.perf_counter() - t0)
    t = float(np.min(laps))
    # bytes: read p(2)+g(2)+m(4)+v(4)+ema(2), write p(2)+m(4)+v(4)+ema(2) = 26 B/param
    bytes_moved = 26 * n
    t2b = t * (2_000_000_000 / n)
    print(
        f"[opt] adamw+power-ema on {n_m}M params: {t * 1e3:.1f} ms  "
        f"({bytes_moved / t / 1e9:.0f} GB/s)  -> extrapolated 2B: {t2b * 1e3:.0f} ms "
        f"(vs 1675 ms fwd+bwd at seq 8320 = {t2b / 1.675 * 100:.1f}% overhead; "
        f"/fsdp_degree when sharded)",
        flush=True,
    )

    # data feed: one post-training batch (uint8 17f 512x832 + text emb)
    video = np.random.default_rng(0).integers(0, 255, (1, 3, 17, 512, 832), dtype=np.uint8)
    emb = np.ones((1, 512, 1024), np.float32)
    put = jax.jit(lambda v, e: (v, e))  # device_put through a jit boundary

    def feed():
        d = jax.device_put((video, emb))
        return _sync(d[0].astype(jnp.float32).reshape(-1)[:8])

    feed()
    laps = []
    for _ in range(5):
        t0 = time.perf_counter()
        feed()
        laps.append(time.perf_counter() - t0)
    tf = float(np.min(laps))
    mb = (video.nbytes + emb.nbytes) / 1e6
    print(
        f"[feed] host->device {mb:.0f} MB batch: {tf * 1e3:.1f} ms "
        f"({mb / 1e3 / tf:.2f} GB/s; {tf / 1.675 * 100:.1f}% of the seq-8320 step if unoverlapped)",
        flush=True,
    )


if __name__ == "__main__":
    main()
