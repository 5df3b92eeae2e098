"""Single-chip FULL fine-tune ceiling with optimizer-state memory modes.

VERDICT r4 #4: the 16 GB chip tops out at seq 8320 for full fine-tune
(grads-only programs, docs/PERF.md "Largest trainable geometry"), and the
repo's answer was LoRA. This probe measures what the optimizer-state
memory modes buy for a REAL full train step — fwd + bwd + AdamW update,
params AND optimizer state device-resident (or host-offloaded), donated:

  * fp32   — optax adamw baseline (8 bytes/param of moments)
  * bf16   — training/optim.scale_by_adam_bf16 (4 bytes/param, stochastic
             rounding; the TPU-native lever the reference never needed on
             80 GB GPUs, imaginaire/utils/fused_adam.py:26)
  * host   — bf16 moments pinned to HOST memory (memory_kind="pinned_host"):
             XLA streams them through the update, HBM holds only params +
             grads + activations. The per-step cost is the PCIe/ICI
             round-trip of the moment tree.

For each (geometry, mode): compiled memory_analysis (does it FIT 16 GB?),
then — when it fits — measured step time + MFU (3x-forward FLOP model).

Run: python scripts/full_ft_ceiling.py [seq8320 seq13312 seq19968] [--modes bf16,host]
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

from bench import dit_flops_per_forward
from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT
from cosmos_predict2_tpu.training.optim import OptimizerConfig, make_optimizer

GEOMS = {
    "seq8320": (1, 16, 5, 64, 104),  # 17f 512x832
    "seq13312": (1, 16, 8, 64, 104),  # 29f 512x832
    "seq16640": (1, 16, 10, 64, 104),  # 37f 512x832
    "seq19968": (1, 16, 12, 64, 104),  # 45f 512x832 (the VERDICT target)
}

GIB = 1024**3


def build(geom: str, mode: str):
    B, C, T, H, W = GEOMS[geom]
    cfg = DiTConfig(
        model_channels=2048,
        num_heads=16,
        num_blocks=28,
        use_adaln_lora=True,
        rope_h_extrapolation_ratio=3.0,
        rope_w_extrapolation_ratio=3.0,
        rope_enable_fps_modulation=False,
        dtype=jnp.bfloat16,
        remat="block",
        scan_blocks=True,
    )
    net = MiniTrainDIT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C, T, H, W), dtype=jnp.bfloat16)
    ts = jnp.full((B,), 500.0, dtype=jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 512, 1024), dtype=jnp.bfloat16) * 0.02

    shapes = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x, ts, ctx))
    keys = iter(jax.random.split(jax.random.PRNGKey(42), len(jax.tree.leaves(shapes))))
    params = jax.tree.map(
        lambda s: jax.random.normal(next(keys), s.shape, jnp.bfloat16) * jnp.bfloat16(0.02),
        shapes,
    )

    opt_cfg = OptimizerConfig(
        warm_up_steps=(10,), cycle_lengths=(1000,), grad_clip_norm=None,
        moments_dtype="float32" if mode == "fp32" else "bfloat16",
    )
    tx = make_optimizer(opt_cfg)
    opt_state = tx.init(params)

    dev = jax.devices()[0]
    hbm = jax.sharding.SingleDeviceSharding(dev)
    host = jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")

    def to_kind(tree, kind):
        # big moment tensors only; scalars (count, PRNG key) stay in HBM
        return jax.tree.map(
            lambda leaf: jax.device_put(leaf, kind) if getattr(leaf, "ndim", 0) >= 2 else leaf,
            tree,
        )

    def step(params, opt_state, x, ts, ctx):
        def loss_fn(p):
            v = net.apply(p, x, ts, ctx)
            return jnp.mean(jnp.square(v.astype(jnp.float32)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if mode == "host":
            # explicit memory-space round trip: the update math runs on
            # device, the persistent moments live in pinned host memory
            opt_state = to_kind(opt_state, hbm)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        if mode == "host":
            opt_state2 = to_kind(opt_state2, host)
        params2 = jax.tree.map(lambda p, u: (p.astype(jnp.float32) + u).astype(p.dtype), params, updates)
        return params2, opt_state2, loss

    return net, cfg, params, opt_state, step, (x, ts, ctx)


def run(geom: str, mode: str, execute: bool = True) -> dict:
    dev = jax.devices()[0]
    net, cfg, params, opt_state, step, batch = build(geom, mode)
    B, C, T, H, W = GEOMS[geom]
    seq = T * (H // 2) * (W // 2)

    if mode == "host":
        # moments start out resident in pinned host memory; the step's
        # explicit device_put round trip streams them through the update
        host = jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")
        opt_state = jax.tree.map(
            lambda leaf: jax.device_put(leaf, host) if getattr(leaf, "ndim", 0) >= 2 else leaf,
            opt_state,
        )

    jitted = jax.jit(step, donate_argnums=(0, 1))
    lowered = jitted.lower(params, opt_state, *batch)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    ma = compiled.memory_analysis()
    info = {}
    try:
        info = {
            "argument_gib": round(ma.argument_size_in_bytes / GIB, 2),
            "output_gib": round(ma.output_size_in_bytes / GIB, 2),
            "temp_gib": round(ma.temp_size_in_bytes / GIB, 2),
            "alias_gib": round(ma.alias_size_in_bytes / GIB, 2),
        }
        # peak demand ~ args + temp + out - aliased (donated args reused)
        demand = (
            ma.argument_size_in_bytes + ma.temp_size_in_bytes + ma.output_size_in_bytes
            - ma.alias_size_in_bytes
        )
        info["demand_gib"] = round(demand / GIB, 2)
    except Exception as e:  # noqa: BLE001
        info["memory_analysis_error"] = str(e)[:120]
    print(f"[{geom} {mode}] compiled in {compile_s:.0f}s; memory: {info}", flush=True)

    result = {"geom": geom, "mode": mode, "seq": seq, **info}
    if not execute:
        return result
    try:
        p2, o2, loss = compiled(params, opt_state, *batch)
        l0 = float(loss)
        laps = []
        for _ in range(3):
            t0 = time.perf_counter()
            p2, o2, loss = compiled(p2, o2, *batch)
            l = float(loss)
            laps.append(time.perf_counter() - t0)
        t_step = min(laps)
        flops = 3 * dit_flops_per_forward(seq, 2048, 28, 8192, tokens_per_frame=(H // 2) * (W // 2))
        peak = 197e12
        result.update(
            step_s=round(t_step, 3),
            mfu=round(flops / t_step / peak, 4),
            loss=l0,
        )
        print(
            f"[{geom} {mode}] FULL train step: {t_step:.3f} s/step, "
            f"MFU {100 * flops / t_step / peak:.1f}% (3x-fwd model), loss {l0:.4f}",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        result["execute_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(f"[{geom} {mode}] EXECUTE FAILED: {result['execute_error']}", flush=True)
    return result


def main() -> None:
    geoms = [a for a in sys.argv[1:] if a in GEOMS] or ["seq8320", "seq13312", "seq19968"]
    modes = ["bf16", "host"]
    for a in sys.argv[1:]:
        if a.startswith("--modes"):
            modes = a.split("=", 1)[1].split(",")
    rows = []
    for geom in geoms:
        for mode in modes:
            try:
                rows.append(run(geom, mode))
            except Exception as e:  # noqa: BLE001
                print(f"[{geom} {mode}] FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
                rows.append({"geom": geom, "mode": mode, "error": str(e)[:200]})
    import json

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
