"""Mesh + Ulysses context-parallel attention tests on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cosmos_predict2_tpu.ops.attention import reference_attention
from cosmos_predict2_tpu.parallel.cp import ulysses_attention
from cosmos_predict2_tpu.parallel.mesh import make_mesh, param_sharding_rules, shard_params


@pytest.mark.chips(8)
@pytest.mark.level(0)
def test_ulysses_matches_reference():
    mesh = make_mesh(1, 1, 8, 1)
    B, S, H, D = 2, 64, 8, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))

    with jax.set_mesh(mesh):
        sharding = NamedSharding(mesh, P(None, "cp", None, None))
        qs, ks, vs = (jax.device_put(t, sharding) for t in (q, k, v))
        out = jax.jit(lambda a, b, c: ulysses_attention(a, b, c, axis_name="cp", backend="reference"))(qs, ks, vs)
    expected = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)


@pytest.mark.chips(8)
@pytest.mark.level(0)
def test_ulysses_neighborhood_attention_matches_reference():
    """NA under CP (reference NattenA2AAttnOp, a2a_cp.py:222): a2a then the
    sparse window on the full gathered sequence == single-device NA."""
    from cosmos_predict2_tpu.ops.neighborhood_attention import (
        VideoSize,
        neighborhood_attention_reference,
    )

    mesh = make_mesh(1, 1, 4, 1, devices=jax.devices()[:4])
    size, window = VideoSize(4, 4, 4), (1, 3, 3)
    B, S, H, D = 1, size.T * size.H * size.W, 8, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))

    with jax.set_mesh(mesh):
        sharding = NamedSharding(mesh, P(None, "cp", None, None))
        qs, ks, vs = (jax.device_put(t, sharding) for t in (q, k, v))
        out = jax.jit(
            lambda a, b, c: ulysses_attention(
                a, b, c, axis_name="cp", na_video_size=tuple(size), na_window=window
            )
        )(qs, ks, vs)
    expected = neighborhood_attention_reference(q, k, v, size, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)


@pytest.mark.chips(8)
@pytest.mark.level(0)
def test_ulysses_grads_match():
    mesh = make_mesh(1, 1, 4, 1, devices=jax.devices()[:4])
    B, S, H, D = 1, 32, 4, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))

    def loss_cp(q):
        return jnp.sum(ulysses_attention(q, q, q, axis_name="cp", backend="reference") ** 2)

    def loss_ref(q):
        return jnp.sum(reference_attention(q, q, q) ** 2)

    with jax.set_mesh(mesh):
        qs = jax.device_put(q, NamedSharding(mesh, P(None, "cp", None, None)))
        g_cp = jax.jit(jax.grad(loss_cp))(qs)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g_cp), np.asarray(g_ref), atol=1e-4)


@pytest.mark.chips(8)
@pytest.mark.level(0)
def test_param_sharding_rules():
    import jax.tree_util as jtu

    params = {
        "blocks_0": {
            "self_attn": {"q_proj": {"kernel": jnp.zeros((64, 64))}},
            "mlp": {"layer2": {"kernel": jnp.zeros((256, 64))}},
        },
        "t_embedding_norm": {"weight": jnp.zeros((64,))},
    }
    flat = jtu.tree_flatten_with_path(params)[0]
    specs = {"/".join(str(getattr(p, "key", p)) for p in path): param_sharding_rules(path, leaf) for path, leaf in flat}
    assert specs["blocks_0/self_attn/q_proj/kernel"] == P("fsdp", "tp")
    assert specs["blocks_0/mlp/layer2/kernel"] == P("tp", "fsdp")
    assert specs["t_embedding_norm/weight"] == P()

    mesh = make_mesh(1, 2, 1, 4)
    sharded = shard_params(params, mesh)
    leaf = sharded["blocks_0"]["self_attn"]["q_proj"]["kernel"]
    assert leaf.sharding.spec == P("fsdp", "tp")


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_dit_forward_with_cp():
    """Full tiny DiT forward with sequence parallelism over latent T."""
    import dataclasses

    from cosmos_predict2_tpu.networks.dit import MiniTrainDIT, PRESETS

    mesh = make_mesh(1, 1, 4, 1, devices=jax.devices()[:4])
    # heads must be divisible by cp for the Ulysses head scatter
    cfg = dataclasses.replace(
        PRESETS["test"], dtype=jnp.float32, remat="none", model_channels=256, num_heads=4, adaln_lora_dim=32
    )
    cfg_cp = dataclasses.replace(cfg, cp_axis="cp")
    net, net_cp = MiniTrainDIT(cfg), MiniTrainDIT(cfg_cp)

    B, C, T, H, W = 1, 16, 4, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C, T, H, W))
    ts = jnp.full((B,), 700.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 1024)) * 0.05
    params = net.init(jax.random.PRNGKey(2), x, ts, ctx)

    expected = net.apply(params, x, ts, ctx)
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "cp")))
        got = jax.jit(lambda p, a: net_cp.apply(p, a, ts, ctx))(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_qwen_tp_fsdp_sharded_forward():
    """Qwen LM forward with tp=2/fsdp=2 sharded params == single device
    (the reference's Colwise/Rowwise TP plan, parallelize_qwen.py:114-238)."""
    import dataclasses

    from cosmos_predict2_tpu.text_encoders.qwen import QwenConfig, QwenLM

    cfg = dataclasses.replace(
        QwenConfig(),
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, dtype=jnp.float32,
    )
    lm = QwenLM(cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 16)))
    params = lm.init(jax.random.PRNGKey(0), ids)
    expected = lm.apply(params, ids)

    mesh = make_mesh(1, 2, 1, 2, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        got = jax.jit(lm.apply)(sharded, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=2e-5)


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_sharded_training_step_matches_single_device():
    """3 trainer steps with params sharded over fsdp=2/tp=2 produce the
    same losses and final params as the unsharded run (ZeRO-3 + TP is a
    layout choice, not a numerics change)."""
    import dataclasses

    from cosmos_predict2_tpu.conditioning.conditioner import make_condition
    from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
    from cosmos_predict2_tpu.networks.dit import PRESETS
    from cosmos_predict2_tpu.training.optim import OptimizerConfig
    from cosmos_predict2_tpu.training.trainer import Trainer, TrainerConfig

    net = dataclasses.replace(
        PRESETS["test"], dtype=jnp.float32, remat="none", model_channels=128, num_heads=4, adaln_lora_dim=16
    )
    model = Video2WorldModel(RFModelConfig(net=net, state_t=2))
    tc = TrainerConfig(
        max_iter=3, logging_iter=10, save_iter=0, seed=0, ema_enabled=True,
        optimizer=OptimizerConfig(lr=1e-4, warm_up_steps=(2,), cycle_lengths=(10,)),
    )

    def batches():
        for i in range(3):
            rng = np.random.RandomState(i)
            latents = jnp.asarray(rng.randn(2, 16, 2, 4, 4), dtype=jnp.float32)
            emb = jnp.asarray(rng.randn(2, 8, 1024), dtype=jnp.float32) * 0.02
            yield latents, make_condition(emb).replace(gt_frames=latents)

    params = model.init_params(jax.random.PRNGKey(0), (2, 16, 2, 4, 4), text_len=8)

    trainer_a = Trainer(tc, model)
    state_a = trainer_a.init_state(jax.tree.map(lambda x: jnp.array(x, copy=True), params))
    state_a = trainer_a.train(state_a, batches())

    mesh = make_mesh(1, 2, 1, 2, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        trainer_b = Trainer(tc, model)
        state_b = trainer_b.init_state(
            shard_params(jax.tree.map(lambda x: jnp.array(x, copy=True), params), mesh)
        )
        state_b = trainer_b.train(state_b, batches())

    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.ema_params), jax.tree.leaves(state_b.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_sharded_checkpoint_save_restore(tmp_path):
    """Orbax round-trip of an fsdp/tp-sharded param tree: restore with the
    same shardings and with different mesh shape (resharding on load)."""
    from cosmos_predict2_tpu.training.checkpointing import Checkpointer

    params = {
        "w_big": jnp.arange(64 * 32, dtype=jnp.float32).reshape(64, 32),
        "qkv": {"q_proj": {"kernel": jnp.ones((32, 64))}},
        "bias": jnp.arange(8.0),
    }
    mesh = make_mesh(1, 2, 1, 2, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        ckpt = Checkpointer(str(tmp_path / "ckpt"), async_save=False)
        ckpt.save(sharded, 1)
        ckpt.wait()

        # restore onto the same shardings
        from cosmos_predict2_tpu.parallel.mesh import param_shardings

        abstract = jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.ShapeDtypeStruct(
                leaf.shape, leaf.dtype, sharding=NamedSharding(mesh, param_sharding_rules(path, leaf))
            ),
            params,
        )
        restored = ckpt.load(abstract)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        ckpt.close()

    # reshard on load: different mesh (fsdp=4)
    mesh2 = make_mesh(1, 4, 1, 1, devices=jax.devices()[:4])
    with jax.set_mesh(mesh2):
        ckpt2 = Checkpointer(str(tmp_path / "ckpt"), async_save=False)
        abstract2 = jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.ShapeDtypeStruct(
                leaf.shape, leaf.dtype, sharding=NamedSharding(mesh2, param_sharding_rules(path, leaf))
            ),
            params,
        )
        restored2 = ckpt2.load(abstract2)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        ckpt2.close()


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_ulysses_kv_cache_matches_single_device():
    """CP streaming decode (head-sharded ring buffers, token-sharded block)
    == single-device cached attention — the multi-chip interactive path."""
    from cosmos_predict2_tpu.ops.flash_attention import _kv_cache_reference
    from cosmos_predict2_tpu.parallel.cp import ulysses_kv_cache_attention

    B, S_blk, H, D, S_max = 1, 8, 4, 16, 32
    fill = 12
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, S_blk, H, D)) for i in range(3))
    k_buf = jax.random.normal(jax.random.PRNGKey(3), (B, H, S_max, D))
    v_buf = jax.random.normal(jax.random.PRNGKey(4), (B, H, S_max, D))
    cache = {"k": k_buf, "v": v_buf, "len": jnp.int32(fill)}

    # single-device reference: update then masked attention (head-major bufs)
    kb = jax.lax.dynamic_update_slice(k_buf, k.transpose(0, 2, 1, 3), (0, 0, fill, 0))
    vb = jax.lax.dynamic_update_slice(v_buf, v.transpose(0, 2, 1, 3), (0, 0, fill, 0))
    ref = _kv_cache_reference(q, kb, vb, jnp.int32(fill + S_blk))

    mesh = make_mesh(1, 1, 4, 1, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        out, new_cache = jax.jit(lambda q, k, v, c: ulysses_kv_cache_attention(q, k, v, c))(
            q, k, v, cache
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_cache["k"]), np.asarray(kb), atol=1e-6)
    assert int(new_cache["len"]) == fill + S_blk


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_ulysses_kv_cache_window_matches_single_device():
    """The sparse cache window composed with the head-sharded CP decode ==
    the single-device windowed attention (the two interactive levers
    stack; parallel/cp.py cache_window_rows)."""
    from cosmos_predict2_tpu.ops.flash_attention import _kv_cache_window_reference
    from cosmos_predict2_tpu.parallel.cp import ulysses_kv_cache_attention

    gh, gw = 4, 8
    F = gh * gw
    B, H, D = 1, 4, 16
    S_max, fill = 4 * F, 2 * F  # whole frames
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, F, H, D)) for i in range(3))
    cache = {
        "k": jax.random.normal(jax.random.PRNGKey(3), (B, H, S_max, D)),
        "v": jax.random.normal(jax.random.PRNGKey(4), (B, H, S_max, D)),
        "len": jnp.int32(fill),
    }
    kb = jax.lax.dynamic_update_slice(cache["k"], k.transpose(0, 2, 1, 3), (0, 0, fill, 0))
    vb = jax.lax.dynamic_update_slice(cache["v"], v.transpose(0, 2, 1, 3), (0, 0, fill, 0))
    ref = _kv_cache_window_reference(q, kb, vb, jnp.int32(fill + F), (gh, gw), 2)

    mesh = make_mesh(1, 1, 4, 1, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        out, new_cache = jax.jit(
            lambda q, k, v, c: ulysses_kv_cache_attention(
                q, k, v, c, cache_grid=(gh, gw), cache_window_rows=2
            )
        )(q, k, v, cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_cache["k"]), np.asarray(kb), atol=1e-6)
    assert int(new_cache["len"]) == fill + F


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_attention_module_kv_cache_cp_routing():
    """networks/dit.Attention routes kv_cache through the CP path when
    cp_axis is set: module output + updated cache == the single-device
    cached-attention branch with the same params."""
    from cosmos_predict2_tpu.networks.dit import Attention

    B, S_blk, H, D, S_max, fill = 1, 8, 8, 16, 64, 24
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S_blk, H * D), dtype=jnp.float32)
    cache = {
        "k": jax.random.normal(jax.random.PRNGKey(1), (B, H, S_max, D), dtype=jnp.float32),
        "v": jax.random.normal(jax.random.PRNGKey(2), (B, H, S_max, D), dtype=jnp.float32),
        "len": jnp.int32(fill),
    }

    single = Attention(query_dim=H * D, context_dim=None, n_heads=H, head_dim=D, dtype=jnp.float32)
    params = single.init(jax.random.PRNGKey(3), x, kv_cache=cache)
    ref_out, ref_cache = single.apply(params, x, kv_cache=cache)

    cp_mod = Attention(
        query_dim=H * D, context_dim=None, n_heads=H, head_dim=D, dtype=jnp.float32, cp_axis="cp"
    )
    mesh = make_mesh(1, 1, 4, 1, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        out, new_cache = jax.jit(lambda p, x, c: cp_mod.apply(p, x, kv_cache=c))(params, x, cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_cache["k"]), np.asarray(ref_cache["k"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_cache["v"]), np.asarray(ref_cache["v"]), atol=1e-6)
    assert int(new_cache["len"]) == int(ref_cache["len"])


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_ulysses_kv_cache_communication_pattern():
    """The compiled CP streaming-decode program moves ONLY the small new
    block: exactly 4 all-to-alls (scatter q/k/v + gather out) on block-sized
    tensors and ZERO all-gathers — the (large) head-sharded KV ring buffers
    never cross chips. Pins the design claim in PERF.md 'Interactive'."""
    import re

    from cosmos_predict2_tpu.parallel.cp import ulysses_kv_cache_attention

    B, S_blk, H, D, S_max, fill = 1, 8, 8, 16, 32, 12
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (B, S_blk, H, D)) for i in range(3))
    cache = {
        "k": jax.random.normal(jax.random.PRNGKey(3), (B, H, S_max, D)),
        "v": jax.random.normal(jax.random.PRNGKey(4), (B, H, S_max, D)),
        "len": jnp.int32(fill),
    }
    mesh = make_mesh(1, 1, 4, 1, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        txt = (
            jax.jit(lambda q, k, v, c: ulysses_kv_cache_attention(q, k, v, c))
            .lower(q, k, v, cache)
            .compile()
            .as_text()
        )
    a2a_defs = [l for l in txt.splitlines() if "all-to-all(" in l]
    assert len(a2a_defs) == 4, a2a_defs
    # each moves only block-sized tensors: total elements per tuple entry ==
    # B * (S_blk/cp) * (H/cp) * D — far below the S_max cache size
    for l in a2a_defs:
        dims = [int(x) for x in re.findall(r"f32\[([\d,]+)\]", l)[0].split(",")]
        assert dims[1] * dims[2] <= S_blk * H // 4, (l, dims)
    assert "all-gather" not in txt


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_scan_uniform_sparse_interleave_under_cp():
    """The production compile shape: scan_uniform folding the dense/sparse
    NA interleave into ONE scan, running under Ulysses CP. The a2a pair is
    hoisted outside the runtime lax.cond (parallel/cp.py), so the cond body
    is collective-free and the uniformly-scanned interleave is legal under
    context parallelism — matches the unrolled single-device net exactly.
    Reference composition: a2a_cp.py:222 (NattenA2AAttnOp) +
    experiment/resume_text2world/sparse_2B.py:326 (n_dense_blocks=7)."""
    import dataclasses

    from cosmos_predict2_tpu.networks.dit import MiniTrainDIT, PRESETS
    from cosmos_predict2_tpu.utils.scan_params import stack_block_params

    cfg = dataclasses.replace(
        PRESETS["test"], dtype=jnp.float32, remat="none",
        model_channels=256, num_heads=4, adaln_lora_dim=32,
        num_blocks=4, n_dense_blocks=2,
        natten_window=(-1, 2, 2), natten_stride=(1, 1, 1),
        rope_enable_fps_modulation=False,
    )
    unrolled = MiniTrainDIT(dataclasses.replace(cfg, scan_blocks=False))
    uniform_cp = MiniTrainDIT(
        dataclasses.replace(cfg, scan_blocks=True, scan_uniform=True, cp_axis="cp")
    )

    B, C, T, H, W = 1, 16, 4, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C, T, H, W))
    ts = jnp.full((B,), 700.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 1024)) * 0.05
    params = unrolled.init(jax.random.PRNGKey(2), x, ts, ctx)
    expected = unrolled.apply(params, x, ts, ctx)

    sparams = stack_block_params(params, dataclasses.replace(cfg, scan_blocks=True, scan_uniform=True))
    mesh = make_mesh(1, 1, 4, 1, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "cp")))
        got = jax.jit(lambda p, a: uniform_cp.apply(p, a, ts, ctx))(sparams, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)


@pytest.mark.level(0)
def test_pp_knob_validates_one():
    """Interface parity for pipeline_model_parallel_size (reference
    imaginaire/trainer.py:86 + parallel_dims.py:25-138: the knob is
    threaded, no schedule exists): pp=1 builds the mesh, pp>1 raises at
    mesh build — the same place ParallelDims validates it."""
    from cosmos_predict2_tpu.configs.defaults import Config

    assert Config().pp_size == 1
    mesh = make_mesh(1, 1, 1, 1, devices=jax.devices()[:1], pp=1)
    assert mesh.shape["cp"] == 1
    with pytest.raises(ValueError, match="pipeline"):
        make_mesh(1, 1, 1, 1, devices=jax.devices()[:1], pp=2)
