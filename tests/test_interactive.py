"""Causal DiT + KV-cache streaming tests.

The load-bearing check: incremental KV-cache decoding must reproduce the
full-sequence block-causal forward frame by frame.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.conditioning.conditioner import make_condition
from cosmos_predict2_tpu.models.interactive import CausalVideo2WorldModel, causal_model_config
from cosmos_predict2_tpu.networks.dit import PRESETS
from cosmos_predict2_tpu.ops.attention import reference_attention


@pytest.mark.level(0)
def test_frame_causal_reference_attention():
    B, S, H, D = 1, 12, 2, 8
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
    out = reference_attention(q, q, q, frame_group=4)
    # queries in frame 0 (tokens 0-3) must equal attention restricted to kv 0-3
    restricted = reference_attention(q[:, :4], q[:, :4], q[:, :4])
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(restricted), atol=1e-5)
    # last frame sees everything
    full = reference_attention(q[:, 8:], q, q)
    np.testing.assert_allclose(np.asarray(out[:, 8:]), np.asarray(full), atol=1e-5)


@pytest.fixture(scope="module")
def causal_setup():
    net = dataclasses.replace(PRESETS["test"], dtype=jnp.float32, remat="none")
    cfg = causal_model_config(net, num_frame_per_block=1, state_t=3)
    model = CausalVideo2WorldModel(cfg)
    shape = (1, 16, 3, 8, 8)
    params = model.init_params(jax.random.PRNGKey(0), shape, text_len=8)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 1024)) * 0.05
    cond = make_condition(emb)
    return model, params, cond, shape


@pytest.mark.level(1)
def test_causal_dit_is_temporally_causal(causal_setup):
    model, params, cond, shape = causal_setup
    x = jax.random.normal(jax.random.PRNGKey(2), shape)
    ts = jnp.full((1, 3), 500.0)
    out1 = model.net.apply(params, x, ts, cond.crossattn_emb)
    x2 = x.at[:, :, 2].set(-x[:, :, 2])  # perturb last latent frame
    out2 = model.net.apply(params, x2, ts, cond.crossattn_emb)
    np.testing.assert_allclose(np.asarray(out1[:, :, :2]), np.asarray(out2[:, :, :2]), atol=1e-5)
    assert np.abs(np.asarray(out1[:, :, 2]) - np.asarray(out2[:, :, 2])).max() > 1e-4


@pytest.mark.level(1)
def test_kv_cache_matches_full_forward(causal_setup):
    """Incremental decode frame-by-frame == full block-causal forward."""
    model, params, cond, shape = causal_setup
    B, C, T, Hh, Ww = shape
    x = jax.random.normal(jax.random.PRNGKey(3), shape)
    ts_full = jnp.full((B, T), 300.0)
    full_out = model.net.apply(params, x, ts_full, cond.crossattn_emb)

    caches = model.init_kv_caches(B, T, Hh, Ww, dtype=jnp.float32)
    outs = []
    for t in range(T):
        frame = x[:, :, t : t + 1]
        ts = jnp.full((B, 1), 300.0)
        out_t, caches = model.forward_with_cache(params, frame, ts, cond, caches, t_start=t)
        outs.append(out_t)
    inc_out = jnp.concatenate(outs, axis=2)
    np.testing.assert_allclose(np.asarray(inc_out), np.asarray(full_out), atol=2e-4)


@pytest.mark.level(1)
def test_kv_cache_matches_full_forward_multi_frame_blocks():
    """Incremental decode in 2-frame blocks (num_frame_per_block=2, the
    probe's throughput mode) == the full block-causal forward."""
    net = dataclasses.replace(PRESETS["test"], dtype=jnp.float32, remat="none")
    cfg = causal_model_config(net, num_frame_per_block=2, state_t=4)
    model = CausalVideo2WorldModel(cfg)
    shape = (1, 16, 4, 8, 8)
    params = model.init_params(jax.random.PRNGKey(0), shape, text_len=8)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 1024)) * 0.05
    cond = make_condition(emb)

    x = jax.random.normal(jax.random.PRNGKey(3), shape)
    ts_full = jnp.full((1, 4), 300.0)
    full_out = model.net.apply(params, x, ts_full, cond.crossattn_emb)

    caches = model.init_kv_caches(1, 4, 8, 8, dtype=jnp.float32)
    outs = []
    for t0 in range(0, 4, 2):
        block = x[:, :, t0 : t0 + 2]
        ts = jnp.full((1, 2), 300.0)
        out_t, caches = model.forward_with_cache(params, block, ts, cond, caches, t_start=t0)
        outs.append(out_t)
    inc_out = jnp.concatenate(outs, axis=2)
    np.testing.assert_allclose(np.asarray(inc_out), np.asarray(full_out), atol=2e-4)


@pytest.mark.level(1)
def test_streaming_generation(causal_setup):
    from cosmos_predict2_tpu.models.interactive import StreamingConfig, StreamingInference

    model, params, cond, shape = causal_setup
    stream = StreamingInference(StreamingConfig(num_frame_per_block=1, cache_frame_size=8, num_steps=2), model)
    init = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 1, 8, 8))
    out = stream.generate(params, jax.random.PRNGKey(5), cond, init, num_latent_frames=4, latent_shape_hw=(8, 8))
    assert out.shape == (1, 16, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.level(1)
def test_streaming_generation_cache_window_full_window_matches_dense(causal_setup):
    """cache_na_window_rows covering the whole grid == the dense cached
    attention, through the FULL streaming generation loop (prefill +
    few-step denoise + commit) — pins the sparse cache-window path's
    degenerate case end to end; a narrow window runs and stays finite."""
    from cosmos_predict2_tpu.models.interactive import (
        CausalVideo2WorldModel,
        StreamingConfig,
        StreamingInference,
        causal_model_config,
    )

    model, params, cond, shape = causal_setup
    scfg = StreamingConfig(num_frame_per_block=1, cache_frame_size=8, num_steps=2)
    init = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 1, 8, 8))
    dense = StreamingInference(scfg, model).generate(
        params, jax.random.PRNGKey(5), cond, init, num_latent_frames=3, latent_shape_hw=(8, 8)
    )

    def windowed_model(rows: int):
        net = dataclasses.replace(model.config.net, cache_na_window_rows=rows)
        m = CausalVideo2WorldModel(causal_model_config(net, num_frame_per_block=1, state_t=3))
        return StreamingInference(scfg, m)

    # token grid is 4x4 (8x8 latent, patch 2): window 4 rows == dense
    full = windowed_model(4).generate(
        params, jax.random.PRNGKey(5), cond, init, num_latent_frames=3, latent_shape_hw=(8, 8)
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(dense), atol=1e-5)

    narrow = windowed_model(2).generate(
        params, jax.random.PRNGKey(5), cond, init, num_latent_frames=3, latent_shape_hw=(8, 8)
    )
    assert np.isfinite(np.asarray(narrow)).all()
    assert np.abs(np.asarray(narrow) - np.asarray(dense)).max() > 1e-6  # sparsity engaged


@pytest.mark.level(1)
def test_streaming_generation_slides_window(causal_setup):
    """Generation past the cache window exercises the (jitted, donated)
    rolling-window shift; lengths and values stay sane across slides."""
    from cosmos_predict2_tpu.models.interactive import StreamingConfig, StreamingInference

    model, params, cond, shape = causal_setup
    stream = StreamingInference(StreamingConfig(num_frame_per_block=1, cache_frame_size=3, num_steps=2), model)
    init = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 1, 8, 8))
    out = stream.generate(params, jax.random.PRNGKey(5), cond, init, num_latent_frames=7, latent_shape_hw=(8, 8))
    assert out.shape == (1, 16, 7, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
    assert stream._jit_shifts, "window slide was never exercised"


@pytest.mark.level(1)
def test_self_forcing_dmd2_losses(causal_setup):
    from cosmos_predict2_tpu.models.interactive import (
        SelfForcingDMD2,
        StreamingConfig,
        StreamingInference,
    )

    model, params, condition, _shape = causal_setup
    streaming = StreamingInference(
        StreamingConfig(num_frame_per_block=1, cache_frame_size=8, num_steps=2), model
    )
    sf = SelfForcingDMD2(streaming)
    h = w = 8
    rng = jax.random.PRNGKey(0)

    # distinct critic weights: grad signal is (fake_x0 - teacher_x0)
    fake_params = jax.tree.map(lambda x: x * 1.05, params)

    # gradient flows to the student through the rollout
    def gloss(p):
        loss, _ = sf.generator_loss(p, params, fake_params, rng, condition, None, n_blocks=2, latent_hw=(h, w))
        return loss

    loss, g = jax.value_and_grad(gloss)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert gnorm > 0.0

    # critic loss: gradient flows to the fake score net, rollout detached
    def closs(p):
        loss, _ = sf.critic_loss(params, p, rng, condition, n_blocks=2, latent_hw=(h, w))
        return loss

    closs_v, cg = jax.value_and_grad(closs)(params)
    assert np.isfinite(float(closs_v))
    assert sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(cg)) > 0.0


@pytest.mark.level(2)
def test_interactive_latency_probe():
    """The streaming-latency probe (scripts/interactive_latency.py) runs
    end-to-end and reports a finite p50; on the chip the same `measure()`
    produces the PERF.md real-time numbers (ref: interactive/inference/
    action_video2world_streaming.py:90-297)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from interactive_latency import measure

    net = dataclasses.replace(PRESETS["test"], dtype=jnp.float32, remat="none", temporal_causal=True)
    r = measure(hw=(8, 8), blocks=3, cache_frames=4, net_cfg=net, num_steps=2)
    assert r["p50_s"] > 0 and np.isfinite(r["p50_s"])
    assert len(r["laps"]) == 3
    assert r["pixel_fps"] == pytest.approx(4 * r["latent_fps"])


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_streaming_generation_under_cp_matches_single_device():
    """The FULL streaming loop (prefill -> per-block few-step denoise ->
    commit -> window slide) under Ulysses CP == the single-device loop:
    the multi-chip interactive path at the generation-loop level, not just
    the attention op (reference interactive/networks/ulysses.py around
    ActionStreamingInference)."""
    from cosmos_predict2_tpu.models.interactive import (
        StreamingConfig,
        StreamingInference,
        causal_model_config,
    )
    from cosmos_predict2_tpu.parallel.mesh import make_mesh

    net = dataclasses.replace(
        PRESETS["test"], num_heads=4, dtype=jnp.float32, remat="none"
    )
    shape = (1, 16, 3, 8, 8)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 1024)) * 0.05
    cond = make_condition(emb)
    init = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 1, 8, 8))

    # params are structure-identical across cp settings; init once (no mesh)
    base_model = CausalVideo2WorldModel(causal_model_config(net, num_frame_per_block=1, state_t=3))
    params = base_model.init_params(jax.random.PRNGKey(0), shape, text_len=8)

    def run(cp_axis, mesh=None):
        model = CausalVideo2WorldModel(
            causal_model_config(dataclasses.replace(net, cp_axis=cp_axis), num_frame_per_block=1, state_t=3)
        )
        stream = StreamingInference(
            StreamingConfig(num_frame_per_block=1, cache_frame_size=3, num_steps=2), model
        )
        import contextlib

        ctx = jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
        with ctx:
            out = stream.generate(
                params, jax.random.PRNGKey(5), cond, init, num_latent_frames=6, latent_shape_hw=(8, 8)
            )
        return np.asarray(jax.device_get(out))

    ref = run(None)
    mesh = make_mesh(1, 1, 4, 1, devices=jax.devices()[:4])
    got = run("cp", mesh)
    assert ref.shape == got.shape == (1, 16, 6, 8, 8)
    # 1e-3: f32 einsum accumulation-order differences between the sharded
    # and single-device cache attention amplify over 6 autoregressive
    # frames (measured ~6e-4 by frame 5; frame 1 agrees to ~1e-4)
    np.testing.assert_allclose(got, ref, atol=1e-3)


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_self_forcing_generator_grad_under_cp_matches_single_device():
    """Self-forcing DMD2 generator loss AND its gradient under Ulysses CP ==
    single device: multi-chip interactive TRAINING (gradients flow through
    the a2a'd, head-sharded KV-cache rollout; the kernel's custom VJP and
    the shard_map transpose compose)."""
    from cosmos_predict2_tpu.models.interactive import (
        SelfForcingDMD2,
        StreamingConfig,
        StreamingInference,
        causal_model_config,
    )
    from cosmos_predict2_tpu.parallel.mesh import make_mesh

    net = dataclasses.replace(PRESETS["test"], num_heads=4, dtype=jnp.float32, remat="none")
    shape = (1, 16, 3, 8, 8)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 1024)) * 0.05
    condition = make_condition(emb)
    base_model = CausalVideo2WorldModel(causal_model_config(net, num_frame_per_block=1, state_t=3))
    params = base_model.init_params(jax.random.PRNGKey(0), shape, text_len=8)
    fake_params = jax.tree.map(lambda x: x * 1.05, params)
    rng = jax.random.PRNGKey(0)

    def run(cp_axis, mesh=None):
        model = CausalVideo2WorldModel(
            causal_model_config(dataclasses.replace(net, cp_axis=cp_axis), num_frame_per_block=1, state_t=3)
        )
        sf = SelfForcingDMD2(
            StreamingInference(StreamingConfig(num_frame_per_block=1, cache_frame_size=8, num_steps=2), model)
        )

        def gloss(p):
            loss, _ = sf.generator_loss(p, params, fake_params, rng, condition, None, n_blocks=2, latent_hw=(8, 8))
            return loss

        import contextlib

        ctx = jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
        with ctx:
            loss, g = jax.jit(jax.value_and_grad(gloss))(params)
            loss, g = jax.device_get((loss, g))
        return float(loss), g

    ref_loss, ref_g = run(None)
    mesh = make_mesh(1, 1, 4, 1, devices=jax.devices()[:4])
    cp_loss, cp_g = run("cp", mesh)
    assert np.isfinite(ref_loss) and abs(cp_loss - ref_loss) < 1e-4 * max(1.0, abs(ref_loss))
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(cp_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3)
