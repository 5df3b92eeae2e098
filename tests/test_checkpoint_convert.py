"""Weight-converter tests: torch state-dict layout -> flax params.

The synthetic state dicts below transcribe the *reference* module naming
(minimal_v4_dit.py / wan2pt1.py) independently from the converter code, so
a transcription typo on either side fails the test.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT
from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig
from cosmos_predict2_tpu.utils.checkpoint_convert import (
    convert_dit_state_dict,
    convert_vae_state_dict,
    strip_prefix,
)

D = 64  # model channels
HEADS = 2
HD = D // HEADS
CTX = 48
LORA = 16
BLOCKS = 2
PATCH_DIM = 17 * 2 * 2 * 1  # (16+1 padding ch) * ps * ps * pt


def synthetic_dit_sd(rng):
    sd = {}

    def lin(out_dim, in_dim):
        return rng.randn(out_dim, in_dim).astype(np.float32)

    sd["x_embedder.proj.1.weight"] = lin(D, PATCH_DIM)
    sd["t_embedder.1.linear_1.weight"] = lin(D, D)
    sd["t_embedder.1.linear_2.weight"] = lin(3 * D, D)
    sd["t_embedding_norm.weight"] = rng.randn(D).astype(np.float32)
    for i in range(BLOCKS):
        for attn, ctx_dim in (("self_attn", D), ("cross_attn", CTX)):
            sd[f"blocks.{i}.{attn}.q_proj.weight"] = lin(D, D)
            sd[f"blocks.{i}.{attn}.k_proj.weight"] = lin(D, ctx_dim)
            sd[f"blocks.{i}.{attn}.v_proj.weight"] = lin(D, ctx_dim)
            sd[f"blocks.{i}.{attn}.output_proj.weight"] = lin(D, D)
            sd[f"blocks.{i}.{attn}.q_norm.weight"] = rng.randn(HD).astype(np.float32)
            sd[f"blocks.{i}.{attn}.k_norm.weight"] = rng.randn(HD).astype(np.float32)
        sd[f"blocks.{i}.mlp.layer1.weight"] = lin(4 * D, D)
        sd[f"blocks.{i}.mlp.layer2.weight"] = lin(D, 4 * D)
        for mod in ("adaln_modulation_self_attn", "adaln_modulation_cross_attn", "adaln_modulation_mlp"):
            sd[f"blocks.{i}.{mod}.1.weight"] = lin(LORA, D)
            sd[f"blocks.{i}.{mod}.2.weight"] = lin(3 * D, LORA)
    sd["final_layer.linear.weight"] = lin(2 * 2 * 1 * 16, D)
    sd["final_layer.adaln_modulation.1.weight"] = lin(LORA, D)
    sd["final_layer.adaln_modulation.2.weight"] = lin(2 * D, LORA)
    return sd


@pytest.mark.level(0)
def test_dit_conversion_structure_and_forward():
    cfg = DiTConfig(
        model_channels=D,
        num_heads=HEADS,
        num_blocks=BLOCKS,
        adaln_lora_dim=LORA,
        crossattn_emb_channels=CTX,
        dtype=jnp.float32,
        remat="none",
    )
    net = MiniTrainDIT(cfg)
    x = jnp.zeros((1, 16, 2, 4, 4))
    ts = jnp.zeros((1,))
    ctx = jnp.zeros((1, 8, CTX))
    ref_params = net.init(jax.random.PRNGKey(0), x, ts, ctx)

    sd = synthetic_dit_sd(np.random.RandomState(0))
    converted = convert_dit_state_dict(sd, num_blocks=BLOCKS, use_adaln_lora=True)

    ref_flat = jax.tree_util.tree_flatten_with_path(ref_params)[0]
    conv_flat = jax.tree_util.tree_flatten_with_path(jax.tree.map(jnp.asarray, converted))[0]
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in ref_flat}
    conv_paths = {jax.tree_util.keystr(p): v.shape for p, v in conv_flat}
    assert ref_paths == conv_paths, (
        f"missing: {set(ref_paths) - set(conv_paths)}; extra: {set(conv_paths) - set(ref_paths)}"
    )

    # transpose orientation: torch (out,in) row 0 == flax kernel column 0
    w_torch = sd["blocks.0.self_attn.q_proj.weight"]
    w_flax = converted["params"]["blocks_0"]["self_attn"]["q_proj"]["kernel"]
    np.testing.assert_allclose(w_torch[0], w_flax[:, 0])

    out = net.apply(jax.tree.map(jnp.asarray, converted), x, ts, ctx)
    assert out.shape == (1, 16, 2, 4, 4)


def synthetic_vae_sd(rng, dim=16, z=16):
    """Transcribes the wan2pt1 module tree for dim_mult=[1,2,4,4], 2 res blocks."""
    sd = {}

    def conv3(o, i, k=(3, 3, 3)):
        return rng.randn(o, i, *k).astype(np.float32)

    def conv2(o, i):
        return rng.randn(o, i, 3, 3).astype(np.float32)

    def add_res(prefix, i, o):
        sd[f"{prefix}.residual.0.gamma"] = rng.randn(i, 1, 1, 1).astype(np.float32)
        sd[f"{prefix}.residual.2.weight"] = conv3(o, i)
        sd[f"{prefix}.residual.2.bias"] = rng.randn(o).astype(np.float32)
        sd[f"{prefix}.residual.3.gamma"] = rng.randn(o, 1, 1, 1).astype(np.float32)
        sd[f"{prefix}.residual.6.weight"] = conv3(o, o)
        sd[f"{prefix}.residual.6.bias"] = rng.randn(o).astype(np.float32)
        if i != o:
            sd[f"{prefix}.shortcut.weight"] = conv3(o, i, (1, 1, 1))
            sd[f"{prefix}.shortcut.bias"] = rng.randn(o).astype(np.float32)

    def add_attn(prefix, c):
        sd[f"{prefix}.norm.gamma"] = rng.randn(c, 1, 1).astype(np.float32)
        sd[f"{prefix}.to_qkv.weight"] = rng.randn(3 * c, c, 1, 1).astype(np.float32)
        sd[f"{prefix}.to_qkv.bias"] = rng.randn(3 * c).astype(np.float32)
        sd[f"{prefix}.proj.weight"] = rng.randn(c, c, 1, 1).astype(np.float32)
        sd[f"{prefix}.proj.bias"] = rng.randn(c).astype(np.float32)

    def add_resample(prefix, dim, out_dim, time_conv_out=None):
        sd[f"{prefix}.resample.1.weight"] = conv2(out_dim, dim)
        sd[f"{prefix}.resample.1.bias"] = rng.randn(out_dim).astype(np.float32)
        if time_conv_out is not None:
            sd[f"{prefix}.time_conv.weight"] = conv3(time_conv_out, dim if time_conv_out != 2 * dim else dim, (3, 1, 1))
            sd[f"{prefix}.time_conv.bias"] = rng.randn(time_conv_out).astype(np.float32)

    d = dim
    dims = [d, d, 2 * d, 4 * d, 4 * d]
    # encoder
    sd["encoder.conv1.weight"] = conv3(dims[0], 3)
    sd["encoder.conv1.bias"] = rng.randn(dims[0]).astype(np.float32)
    li = 0
    for s, (i, o) in enumerate(zip(dims[:-1], dims[1:])):
        for r in range(2):
            add_res(f"encoder.downsamples.{li}", i if r == 0 else o, o)
            li += 1
        if s != 3:
            # temporal_downsample = [False, True, True]
            add_resample(f"encoder.downsamples.{li}", o, o, time_conv_out=o if s in (1, 2) else None)
            li += 1
    add_res("encoder.middle.0", dims[-1], dims[-1])
    add_attn("encoder.middle.1", dims[-1])
    add_res("encoder.middle.2", dims[-1], dims[-1])
    sd["encoder.head.0.gamma"] = rng.randn(dims[-1], 1, 1, 1).astype(np.float32)
    sd["encoder.head.2.weight"] = conv3(2 * z, dims[-1])
    sd["encoder.head.2.bias"] = rng.randn(2 * z).astype(np.float32)

    # decoder: dims [4d, 4d, 4d, 2d, d]; in_dim halved for stages 1,2,3
    ddims = [4 * d, 4 * d, 4 * d, 2 * d, d]
    sd["decoder.conv1.weight"] = conv3(ddims[0], z)
    sd["decoder.conv1.bias"] = rng.randn(ddims[0]).astype(np.float32)
    add_res("decoder.middle.0", ddims[0], ddims[0])
    add_attn("decoder.middle.1", ddims[0])
    add_res("decoder.middle.2", ddims[0], ddims[0])
    li = 0
    for s, (i, o) in enumerate(zip(ddims[:-1], ddims[1:])):
        if s in (1, 2, 3):
            i = i // 2
        for r in range(3):
            add_res(f"decoder.upsamples.{li}", i if r == 0 else o, o)
            li += 1
        if s != 3:
            # temporal_upsample = [True, True, False]; upsample conv halves channels
            add_resample(f"decoder.upsamples.{li}", o, o // 2, time_conv_out=2 * o if s in (0, 1) else None)
            li += 1
    sd["decoder.head.0.gamma"] = rng.randn(ddims[-1], 1, 1, 1).astype(np.float32)
    sd["decoder.head.2.weight"] = conv3(3, ddims[-1])
    sd["decoder.head.2.bias"] = rng.randn(3).astype(np.float32)

    sd["conv1.weight"] = conv3(2 * z, 2 * z, (1, 1, 1))
    sd["conv1.bias"] = rng.randn(2 * z).astype(np.float32)
    sd["conv2.weight"] = conv3(z, z, (1, 1, 1))
    sd["conv2.bias"] = rng.randn(z).astype(np.float32)
    return sd


@pytest.mark.level(1)
def test_vae_conversion_structure_and_forward():
    cfg = WanVAEConfig(dim=16, dtype=jnp.float32)
    vae = WanVAE(cfg)
    clip = jnp.zeros((1, 5, 32, 32, 3))
    ref_params = vae.init(jax.random.PRNGKey(0), clip)

    sd = synthetic_vae_sd(np.random.RandomState(0))
    converted = convert_vae_state_dict(sd)

    ref_flat = jax.tree_util.tree_flatten_with_path(ref_params)[0]
    conv_flat = jax.tree_util.tree_flatten_with_path(jax.tree.map(jnp.asarray, converted))[0]
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in ref_flat}
    conv_paths = {jax.tree_util.keystr(p): v.shape for p, v in conv_flat}
    assert ref_paths == conv_paths, (
        f"missing: {sorted(set(ref_paths) - set(conv_paths))[:5]}; extra: {sorted(set(conv_paths) - set(ref_paths))[:5]}"
    )
    z = vae.apply(jax.tree.map(jnp.asarray, converted), clip, method=WanVAE.encode)
    assert z.shape == (1, 2, 4, 4, 16)


@pytest.mark.level(0)
def test_strip_prefix():
    sd = {"net.a": 1, "net_ema.a": 2, "other": 3}
    assert strip_prefix(sd, "net.") == {"a": 1}
    assert strip_prefix(sd, "net_ema.") == {"a": 2}


@pytest.mark.level(1)
def test_wan_dit_conversion_structure_and_forward():
    import numpy as onp

    from cosmos_predict2_tpu.networks.wan_dit import WanConfig, WanModel
    from cosmos_predict2_tpu.utils.checkpoint_convert import convert_wan_dit_state_dict

    cfg = WanConfig(model_type="i2v", dim=32, ffn_dim=64, num_heads=2, num_layers=2,
                    text_dim=48, clip_dim=16, in_dim=36, out_dim=16, dtype=jnp.float32)
    net = WanModel(cfg)
    x = jnp.zeros((1, 16, 3, 4, 4))
    ref_params = net.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1,)), jnp.zeros((1, 8, 48)),
        y_B_C_T_H_W=jnp.zeros((1, 20, 3, 4, 4)),
        frame_cond_crossattn_emb=jnp.zeros((1, 257, 16)),
    )

    rng = onp.random.RandomState(0)

    def lin(n, i, o, bias=True):
        sd[n + ".weight"] = rng.randn(o, i).astype("float32") * 0.05
        if bias:
            sd[n + ".bias"] = rng.randn(o).astype("float32") * 0.02

    D, F, TD, CD = 32, 64, 48, 16
    sd = {}
    lin("patch_embedding", 36 * 4, D)
    lin("text_embedding.0", TD, D); lin("text_embedding.2", D, D)
    lin("time_embedding.0", 256, D); lin("time_embedding.2", D, D)
    lin("time_projection.1", D, 6 * D)
    lin("head.head", D, 16 * 4)
    sd["head.modulation"] = rng.randn(1, 2, D).astype("float32") * 0.1
    sd["img_emb.proj.0.weight"] = onp.ones(CD, "float32"); sd["img_emb.proj.0.bias"] = onp.zeros(CD, "float32")
    lin("img_emb.proj.1", CD, CD); lin("img_emb.proj.3", CD, D)
    sd["img_emb.proj.4.weight"] = onp.ones(D, "float32"); sd["img_emb.proj.4.bias"] = onp.zeros(D, "float32")
    for i in range(2):
        t = f"blocks.{i}."
        for a in ("self_attn", "cross_attn"):
            for n in "qkvo":
                lin(t + f"{a}.{n}", D, D)
            sd[t + f"{a}.norm_q.weight"] = onp.ones(D, "float32")
            sd[t + f"{a}.norm_k.weight"] = onp.ones(D, "float32")
        lin(t + "cross_attn.k_img", D, D); lin(t + "cross_attn.v_img", D, D)
        sd[t + "cross_attn.norm_k_img.weight"] = onp.ones(D, "float32")
        sd[t + "norm3.weight"] = onp.ones(D, "float32"); sd[t + "norm3.bias"] = onp.zeros(D, "float32")
        lin(t + "ffn.0", D, F); lin(t + "ffn.2", F, D)
        sd[t + "modulation"] = rng.randn(1, 6, D).astype("float32") * 0.1

    converted = convert_wan_dit_state_dict(sd, num_layers=2, i2v=True)
    # identical tree structure (same keys, same shapes)
    ref_flat = {"/".join(map(str, k)): v.shape for k, v in jax.tree_util.tree_flatten_with_path(ref_params)[0]}
    got_flat = {"/".join(map(str, k)): onp.shape(v) for k, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(ref_flat) == set(got_flat), set(ref_flat) ^ set(got_flat)
    for k in ref_flat:
        assert ref_flat[k] == got_flat[k], (k, ref_flat[k], got_flat[k])
    out = net.apply(
        jax.tree.map(jnp.asarray, converted), x, jnp.full((1,), 500.0), jnp.zeros((1, 8, 48)),
        y_B_C_T_H_W=jnp.zeros((1, 20, 3, 4, 4)),
        frame_cond_crossattn_emb=jnp.zeros((1, 257, 16)),
    )
    assert out.shape == (1, 16, 3, 4, 4) and np.isfinite(np.asarray(out)).all()
