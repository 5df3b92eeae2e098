"""MiniTrainDIT — the Cosmos video diffusion transformer, rebuilt in Flax.

Architecture parity with the reference ``MiniTrainDIT``
(cosmos_predict2/_src/predict2/networks/minimal_v4_dit.py:1250-1741):

  * PatchEmbed: rearrange b c (t r) (h m) (w n) -> b t h w (c r m n) + Linear
    (no bias) over 2x2x1 patches (:846-913); optional padding-mask channel.
  * 3D RoPE with per-axis NTK extrapolation factors and optional
    fps-modulated temporal frequencies (:539-667) — see ops/rope.py.
  * Sinusoidal ``Timesteps`` ([cos, sin] order, :727-748) + AdaLN-LoRA
    ``TimestepEmbedding`` (:751-788): with LoRA, the block-modulation input
    is the *raw* sinusoidal embedding and the MLP emits the shared B_T_3D
    LoRA term; RMSNorm(eps 1e-6) on the t embedding (:1421).
  * N x Block = AdaLN(3D)-gated self-attn -> cross-attn -> GPT2 MLP
    (:998-1247), per-head q/k RMSNorm, affine-free LayerNorm eps 1e-6.
  * FinalLayer: AdaLN(2D) + Linear unpatchify (:916-995).

2B config: 2048 ch / 16 heads / 28 blocks; 14B: 5120/40/36
(configs/video2world/defaults/net.py:82-94). TPU-first choices: bf16
compute with fp32 params and fp32 norms/modulation, flash-attention Pallas
kernel for the (t h w) self-attention, everything shape-static under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cosmos_predict2_tpu.ops.attention import dot_product_attention
from cosmos_predict2_tpu.ops.normalization import layer_norm, rms_norm
from cosmos_predict2_tpu.ops.rope import RopeSpec, rope_angles_3d


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    max_img_h: int = 240
    max_img_w: int = 240
    max_frames: int = 128
    in_channels: int = 16
    out_channels: int = 16
    patch_spatial: int = 2
    patch_temporal: int = 1
    concat_padding_mask: bool = True
    model_channels: int = 2048
    num_blocks: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    crossattn_emb_channels: int = 1024
    use_crossattn_projection: bool = False
    crossattn_proj_in_channels: int = 1024
    use_adaln_lora: bool = True
    adaln_lora_dim: int = 256
    rope_h_extrapolation_ratio: float = 1.0
    rope_w_extrapolation_ratio: float = 1.0
    rope_t_extrapolation_ratio: float = 1.0
    rope_enable_fps_modulation: bool = True
    extra_per_block_abs_pos_emb: bool = False
    min_fps: int = 1
    max_fps: int = 30
    # --- sparse (neighborhood) attention (reference minimal_v4_dit.py:1743-1813) ---
    # n_dense_blocks = -1: all dense; 0: all sparse; k>0: k blocks stay
    # dense, evenly distributed; sparse blocks use the NA window below.
    n_dense_blocks: int = -1
    natten_window: tuple[int, int, int] = (-1, 12, 24)
    # GNA stride + adaptive scaling base (reference production sparse
    # configs: stride (1, 4, 8), base_size (-1, 44, 80) —
    # configs/video2world/experiment/resume_text2world/sparse_2B.py:327)
    natten_stride: tuple[int, int, int] = (1, 1, 1)
    natten_dilation: tuple[int, int, int] = (1, 1, 1)
    natten_base_size: Optional[tuple[int, int, int]] = None
    # per-layer GNA parameters (reference sparse_14B.py:29-105: a list with
    # one entry per block, None = dense). Each entry is a 4-tuple
    # (window, stride, dilation, base_size); when set this overrides
    # n_dense_blocks and the global natten_* fields.
    natten_parameters: Optional[tuple[Optional[tuple], ...]] = None
    # --- camera conditioning (reference camera/networks/minimal_v4_dit_camera_conditioned.py) ---
    # per-block bias-free linear projecting a per-token camera embedding
    # (Plücker-ray style, dim camera_dim) added to the normalized hidden
    # states before self-attention (:1080,1189-1195)
    camera_dim: Optional[int] = None
    # --- interactive / causal (reference interactive/networks/dit_causal.py) ---
    # temporal block-causal self-attention: frame t attends frames <= t
    # (grouped by num_frame_per_block); enables KV-cache streaming decode
    temporal_causal: bool = False
    num_frame_per_block: int = 1
    # sparse cache-window streaming decode: >0 = visible kv ROWS per query
    # (NATTEN-clamped, full columns, all cached frames) on the per-frame
    # token grid — the production GNA sparsity composed into the KV-cache
    # loop (ops/flash_attention.flash_attention_kv_cache_window). A
    # beyond-parity distilled-student config, like DMD2+sparse.
    cache_na_window_rows: int = -1
    # --- multiview (reference predict2_multiview/networks/multiview_dit.py) ---
    # n_views > 1: input latent T axis is (V Tv) view-major; RoPE repeats
    # per view; cross-attention attends each view to its own caption slice.
    n_views: int = 1
    # learned per-view embedding concatenated as input channels
    concat_view_embedding: bool = False
    n_cameras_emb: int = 7
    view_condition_dim: int = 0
    # tokens per view in crossattn_emb (each view's caption length)
    tokens_per_view: int = 512
    # cross-VIEW attention (reference predict2_multiview/networks/
    # multiview_cross_dit.py:115-231 CrossViewAttention): between self- and
    # text-cross-attention, each view's per-frame tokens attend the SAME
    # frame's tokens of its neighbor views. cross_view_attn_map[v] = tuple
    # of neighbor view indices for view v. TPU-first: the map is static, so
    # instead of the reference's gather + padded kv + attention mask we run
    # one dense (unmasked) attention per view over its exact neighbor set —
    # zero padding waste, no masks, V small. Views are assumed to be
    # 0..n_views-1 in order (the full camera rig); the reference's dynamic
    # view-subset gather is a training-sampler detail, not a capability.
    enable_cross_view_attn: bool = False
    cross_view_attn_map: Optional[tuple[tuple[int, ...], ...]] = None
    # --- action conditioning (reference action_conditioned_minimal_v1_lvg_dit.py:47-112) ---
    # concat the (B,1,T,H,W) condition mask as an extra input channel
    concat_condition_mask: bool = False
    # when set, two GELU-tanh MLPs embed the flattened action chunk and add
    # it to the timestep embedding (B_D) and the AdaLN-LoRA term (B_3D)
    action_dim: Optional[int] = None
    num_action_per_chunk: int = 12
    # per-LATENT-FRAME action embeddings (reference ActionChunkCausalDIT,
    # interactive/networks/dit_action_causal.py:61-190): actions grouped by
    # latent frame (num_action_per_latent_frame each), embedded per frame,
    # frame 0 zero-padded — used by the causal/interactive action family.
    # False = one chunk-level embedding (the non-causal LVG action DiT).
    action_per_latent_frame: bool = False
    num_action_per_latent_frame: int = 4
    timestep_scale: float = 1.0
    # compute dtype for matmuls; norms & modulation stay fp32
    dtype: jnp.dtype = jnp.bfloat16
    # attention backend override (None = auto dispatch)
    atten_backend: Optional[str] = None
    # remat ("gradient checkpoint") policy for blocks, the jax.checkpoint
    # analogue of the reference's SAC (selective_activation_checkpoint.py:1-73
    # + CheckpointPolicy in minimal_v4_dit.py:58-203):
    #   "none"      - save everything (inference / small models)
    #   "block"     - full per-block remat (recompute everything in bwd)
    #   "selective" - per-block remat but SAVE the self/cross attention
    #                 outputs (tagged "attn_out"); everything else is
    #                 recomputed. The reference policy likewise keeps flash
    #                 results; saving *all* dots OOMs a 16GB v5e at 2B/4800.
    remat: str = "block"
    # scan-over-blocks (maxtext-style): roll consecutive same-config blocks
    # into one lax.scan'd module with stacked parameters. The compiled
    # program carries ONE block body per segment instead of num_blocks
    # copies — ~28x smaller HLO for the dense 2B, minutes less XLA compile
    # at full scale, and fwd+bwd programs that fit compile-helper limits.
    # Parameter layout changes (blocks_i -> stacked blocks_scan{start}); use
    # utils/scan_params.stack_block_params to convert existing checkpoints.
    # INCOMPATIBLE with kv-cache streaming, intermediate-feature taps, and
    # per-index "mixed:K" remat (those need per-block python control): the
    # forward raises a clear error — run those with scan_blocks=False and
    # utils/scan_params.unstack_block_params on the parameters.
    scan_blocks: bool = False
    # Uniform scan (with scan_blocks): ONE nn.scan over ALL blocks with a
    # scanned per-block boolean choosing dense vs sparse attention via
    # lax.cond at runtime, instead of one scan segment per config run. The
    # sparse_2B interleave (7 dense blocks spread over 28) otherwise traces
    # 13 segments — 6 of them sparse, each embedding its own copies of the
    # three NA Mosaic kernels, which overwhelms this environment's
    # remote-compile helper at full-scale grids (>= ~64 kv blocks). Uniform
    # mode compiles each attention kernel exactly ONCE per program. Params
    # stack across all blocks (blocks_scan0); block_segments returns a
    # single segment so the scan_params converters handle the layout.
    # Requires: no per-layer natten_parameters, no kv-cache streaming.
    # Legal under cp_axis: the Ulysses a2a pair is hoisted outside the
    # lax.cond (both branches consume the gathered head-sharded sequence),
    # keeping the cond body collective-free.
    scan_uniform: bool = False
    # cp mesh axis name (when run under shard_map sequence parallelism)
    cp_axis: Optional[str] = None
    # "ulysses" (all-to-all head scatter, cp <= num_heads) or
    # "ring" (K/V ppermute ring, any cp degree / longest sequences)
    cp_strategy: str = "ulysses"

    @property
    def head_dim(self) -> int:
        return self.model_channels // self.num_heads

    @property
    def rope_spec(self) -> RopeSpec:
        return RopeSpec(
            head_dim=self.head_dim,
            h_extrapolation_ratio=self.rope_h_extrapolation_ratio,
            w_extrapolation_ratio=self.rope_w_extrapolation_ratio,
            t_extrapolation_ratio=self.rope_t_extrapolation_ratio,
            enable_fps_modulation=self.rope_enable_fps_modulation,
        )


def trunc_normal_init(std: float):
    """trunc_normal(std, a=-3*std, b=3*std) used throughout the reference."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -3.0, 3.0, shape, dtype)

    return init


class Dense(nn.Module):
    """Linear layer matching torch nn.Linear semantics (y = x W^T + b)."""

    features: int
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype), preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class RMSNormParam(nn.Module):
    """RMSNorm with learnable weight (TE RMSNorm parity, eps 1e-6)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        return rms_norm(x, weight, self.eps)


class Attention(nn.Module):
    """Self- or cross-attention with per-head q/k RMSNorm + RoPE (self only).

    Parity: minimal_v4_dit.py:291-497. Projections are bias-free; q_norm and
    k_norm are RMSNorm over head_dim with eps 1e-6; RoPE only in self-attn.
    """

    query_dim: int
    context_dim: Optional[int]
    n_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    backend: Optional[str] = None
    cp_axis: Optional[str] = None
    cp_strategy: str = "ulysses"
    frame_group: int = 0  # >0: frame-block causal self-attention
    na_video_size: Optional[tuple[int, int, int]] = None  # sparse NA when set
    na_window: tuple[int, int, int] = (-1, -1, -1)
    na_stride: tuple[int, int, int] = (1, 1, 1)
    na_dilation: tuple[int, int, int] = (1, 1, 1)
    # sparse cache-window streaming decode (kv_cache path only): visible kv
    # ROWS per query (NATTEN-clamped) on the cache_grid=(gh, gw) token grid
    cache_window_rows: int = -1
    cache_grid: Optional[tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, context=None, rope_angles=None, kv_cache=None, sparse_switch=None):
        """kv_cache (self-attn streaming decode): dict with
        k/v (B, S_max, H, D) ring buffers and ``len`` (filled tokens).
        Returns (out, new_cache) when kv_cache is given, else out.

        sparse_switch (scan_uniform): traced boolean — lax.cond between the
        NA kernel and dense attention so ONE traced copy of each serves
        every block of a uniformly-scanned interleave net.
        """
        is_selfattn = context is None
        inner = self.n_heads * self.head_dim
        ctx_dim = self.query_dim if self.context_dim is None else self.context_dim
        ctx = x if context is None else context

        std_q = 1.0 / np.sqrt(self.query_dim)
        std_kv = 1.0 / np.sqrt(ctx_dim)
        q = Dense(inner, kernel_init=trunc_normal_init(std_q), dtype=self.dtype, name="q_proj")(x)
        k = Dense(inner, kernel_init=trunc_normal_init(std_kv), dtype=self.dtype, name="k_proj")(ctx)
        v = Dense(inner, kernel_init=trunc_normal_init(std_kv), dtype=self.dtype, name="v_proj")(ctx)

        def split_heads(t):
            return t.reshape(t.shape[:-1] + (self.n_heads, self.head_dim))

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        q = RMSNormParam(self.head_dim, name="q_norm")(q)
        k = RMSNormParam(self.head_dim, name="k_norm")(k)
        if is_selfattn and rope_angles is not None:
            from cosmos_predict2_tpu.ops.rope import apply_rope

            q = apply_rope(q, rope_angles)
            k = apply_rope(k, rope_angles)

        new_cache = None
        if kv_cache is not None and self.cp_axis is not None:
            # sequence-parallel streaming decode: block tokens sharded over
            # cp, ring buffers head-sharded (see ulysses_kv_cache_attention);
            # the sparse cache window composes per head shard
            assert is_selfattn, "kv cache only applies to self-attention"
            from cosmos_predict2_tpu.parallel.cp import ulysses_kv_cache_attention

            out, new_cache = ulysses_kv_cache_attention(
                q, k, v, kv_cache, self.cp_axis,
                cache_grid=self.cache_grid, cache_window_rows=self.cache_window_rows,
            )
        elif kv_cache is not None:
            assert is_selfattn, "kv cache only applies to self-attention"
            s_new = k.shape[1]
            # ring buffers are HEAD-MAJOR (B, H, S_max, D): the flash decode
            # kernel consumes them with no relayout (the old (B, S, H, D)
            # layout re-transposed the FULL cache on every one of the
            # 112 attention calls per block step); only the small new block
            # is transposed here.
            kh = k.transpose(0, 2, 1, 3).astype(kv_cache["k"].dtype)
            vh = v.transpose(0, 2, 1, 3).astype(kv_cache["v"].dtype)
            k_buf = jax.lax.dynamic_update_slice(kv_cache["k"], kh, (0, 0, kv_cache["len"], 0))
            v_buf = jax.lax.dynamic_update_slice(kv_cache["v"], vh, (0, 0, kv_cache["len"], 0))
            new_cache = {"k": k_buf, "v": v_buf, "len": kv_cache["len"] + s_new}
            if self.cache_window_rows > 0:
                # row-banded sparse cache window (GNA inside the streaming
                # loop — a supported beyond-parity student config; both the
                # Pallas kernel and the off-TPU reference live behind this
                # call, and its VJP trains the self-forcing student with
                # the same sparsity it streams with)
                from cosmos_predict2_tpu.ops.flash_attention import flash_attention_kv_cache_window

                assert self.cache_grid is not None, "cache_window_rows needs cache_grid=(gh, gw)"
                out = flash_attention_kv_cache_window(
                    q, k_buf, v_buf, new_cache["len"], tuple(self.cache_grid), self.cache_window_rows
                )
            elif jax.default_backend() == "tpu":
                # flash decode over the ring buffer: the materialized-score
                # alternative allocates an f32 (H, Sq, S_max) matrix —
                # 6.66 GB at 720p cache-16, which alone OOMs a 16 GB chip.
                # Differentiable (custom VJP through the masked-softmax
                # reference) so the self-forcing rollout trains on TPU.
                from cosmos_predict2_tpu.ops.flash_attention import flash_attention_kv_cache

                out = flash_attention_kv_cache(q, k_buf, v_buf, new_cache["len"])
            else:
                # masked attention over the buffer: only filled positions visible
                from cosmos_predict2_tpu.ops.flash_attention import _kv_cache_reference

                out = _kv_cache_reference(q, k_buf, v_buf, new_cache["len"])
        elif self.na_video_size is not None and is_selfattn and self.na_video_size[0] != 1:
            # T==1 (image batches) falls through to dense attention below,
            # mirroring the reference's explicit NATTEN bypass for images
            # (neighborhood_attn.py:226-228).
            if self.cp_axis is not None:
                # a2a + local neighborhood attention on the gathered full
                # sequence — the reference's NattenA2AAttnOp (a2a_cp.py:222).
                # Under scan_uniform the traced dense/sparse switch passes
                # through: the a2a pair is hoisted out of the lax.cond (both
                # branches consume the gathered head-sharded sequence), so
                # the cond body stays collective-free.
                if sparse_switch is not None and self.frame_group != 0:
                    raise ValueError("sparse_switch incompatible with frame-causal attention (frame_group != 0)")
                from cosmos_predict2_tpu.parallel.cp import ulysses_attention

                out = ulysses_attention(
                    q, k, v, axis_name=self.cp_axis, backend=self.backend,
                    na_video_size=self.na_video_size, na_window=self.na_window,
                    na_stride=self.na_stride, na_dilation=self.na_dilation,
                    sparse_switch=sparse_switch,
                )
            else:
                from cosmos_predict2_tpu.ops.neighborhood_attention import (
                    VideoSize,
                    neighborhood_attention_auto,
                )

                size = VideoSize(*self.na_video_size)

                def _na_fn(q_, k_, v_):
                    # Pallas on TPU; off-TPU the dispatcher routes big
                    # shapes (>2^27 logit elements) to the gathered
                    # block-sparse XLA executor instead of dense logits
                    return neighborhood_attention_auto(
                        q_, k_, v_, size, self.na_window, stride=self.na_stride, dilation=self.na_dilation
                    )

                if sparse_switch is None:
                    out = _na_fn(q, k, v)
                else:
                    # scan_uniform: runtime dense/sparse choice. Both
                    # branches trace ONCE for the whole scanned net.
                    if self.frame_group != 0:
                        # the dense cond branch below omits frame_group, so
                        # letting this through would silently change semantics
                        raise ValueError("sparse_switch incompatible with frame-causal attention (frame_group != 0)")

                    def _dense_fn(q_, k_, v_):
                        return dot_product_attention(q_, k_, v_, backend=self.backend)

                    out = jax.lax.cond(sparse_switch, _na_fn, _dense_fn, q, k, v)
        elif self.cp_axis is not None and is_selfattn:
            if self.cp_strategy == "ring":
                from cosmos_predict2_tpu.parallel.ring_attention import ring_attention

                out = ring_attention(q, k, v, axis_name=self.cp_axis, frame_group=self.frame_group)
            else:
                from cosmos_predict2_tpu.parallel.cp import ulysses_attention

                out = ulysses_attention(
                    q, k, v, axis_name=self.cp_axis, backend=self.backend, frame_group=self.frame_group
                )
        else:
            out = dot_product_attention(
                q, k, v, backend=self.backend, frame_group=self.frame_group if is_selfattn else 0
            )
        # tag for the "selective" remat policy (save attention, recompute rest)
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(out, "attn_out")
        out = out.reshape(out.shape[:-2] + (inner,))

        std_o = 1.0 / np.sqrt(inner)
        out = Dense(self.query_dim, kernel_init=trunc_normal_init(std_o), dtype=self.dtype, name="output_proj")(out)
        if kv_cache is not None:
            return out, new_cache
        return out


class CrossViewAttention(nn.Module):
    """Per-frame attention from each view to its neighbor views.

    Parity: multiview_cross_dit.py:115-231. One shared set of q/k/v/o
    projections (bias-free) with per-head q/k RMSNorm, NO RoPE; the output
    projection is ZERO-initialized so a freshly added cross-view path is an
    identity residual. The neighbor map is static config, so each view runs
    a dense attention over exactly its neighbors' same-frame tokens —
    no padded kv, no attention mask (the reference needs both because its
    map is a runtime tensor).
    """

    dim: int
    n_heads: int
    head_dim: int
    attn_map: tuple[tuple[int, ...], ...]
    dtype: jnp.dtype = jnp.bfloat16
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, x_B_V_T_H_W_D):
        B, V, Tv, H, W, D = x_B_V_T_H_W_D.shape
        inner = self.n_heads * self.head_dim
        std = 1.0 / np.sqrt(self.dim)

        x_flat = x_B_V_T_H_W_D.reshape(B, V, Tv, H * W, D)
        q = Dense(inner, kernel_init=trunc_normal_init(std), dtype=self.dtype, name="q_proj")(x_flat)
        k = Dense(inner, kernel_init=trunc_normal_init(std), dtype=self.dtype, name="k_proj")(x_flat)
        v = Dense(inner, kernel_init=trunc_normal_init(std), dtype=self.dtype, name="v_proj")(x_flat)

        def heads(t):  # (B, V, Tv, L, inner) -> (B, V, Tv, L, h, d)
            return t.reshape(t.shape[:-1] + (self.n_heads, self.head_dim))

        q, k, v = heads(q), heads(k), heads(v)
        q = RMSNormParam(self.head_dim, name="q_norm")(q)
        k = RMSNormParam(self.head_dim, name="k_norm")(k)

        L = H * W
        outs = []
        for view in range(V):
            neighbors = tuple(n for n in self.attn_map[view] if 0 <= n < V)
            if not neighbors:
                outs.append(jnp.zeros((B, Tv, L, inner), dtype=self.dtype))
                continue
            # q: this view's tokens per frame; kv: neighbors' same-frame
            # tokens concatenated along the kv sequence.
            q_v = q[:, view].reshape(B * Tv, L, self.n_heads, self.head_dim)
            k_v = jnp.concatenate([k[:, n] for n in neighbors], axis=2)
            v_v = jnp.concatenate([v[:, n] for n in neighbors], axis=2)
            k_v = k_v.reshape(B * Tv, len(neighbors) * L, self.n_heads, self.head_dim)
            v_v = v_v.reshape(B * Tv, len(neighbors) * L, self.n_heads, self.head_dim)
            o = dot_product_attention(q_v, k_v, v_v, backend=self.backend)
            outs.append(o.reshape(B, Tv, L, inner))
        out = jnp.stack(outs, axis=1)  # (B, V, Tv, L, inner)
        out = Dense(self.dim, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="output_proj")(out)
        return out.reshape(B, V, Tv, H, W, D)


class GPT2FeedForward(nn.Module):
    """Linear -> GELU(exact) -> Linear, both bias-free (minimal_v4_dit.py:227-254)."""

    d_model: int
    d_ff: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = Dense(self.d_ff, kernel_init=trunc_normal_init(1.0 / np.sqrt(self.d_model)), dtype=self.dtype, name="layer1")(x)
        h = jax.nn.gelu(h, approximate=False)
        return Dense(self.d_model, kernel_init=trunc_normal_init(1.0 / np.sqrt(self.d_ff)), dtype=self.dtype, name="layer2")(h)


class AdaLNModulation(nn.Module):
    """SiLU -> Linear(s) emitting n_chunks * dim; zero-init last layer.

    With LoRA: SiLU -> Linear(dim->lora_dim) -> Linear(lora_dim->n*dim)
    (minimal_v4_dit.py:1068-1092). Computed in fp32.
    """

    dim: int
    n_chunks: int
    use_lora: bool
    lora_dim: int = 256

    @nn.compact
    def __call__(self, emb):
        emb = jax.nn.silu(emb.astype(jnp.float32))
        if self.use_lora:
            std = 1.0 / np.sqrt(self.dim)
            h = Dense(self.lora_dim, kernel_init=trunc_normal_init(std), dtype=jnp.float32, name="linear_1")(emb)
            return Dense(self.n_chunks * self.dim, kernel_init=nn.initializers.zeros, dtype=jnp.float32, name="linear_2")(h)
        return Dense(self.n_chunks * self.dim, kernel_init=nn.initializers.zeros, dtype=jnp.float32, name="linear_1")(emb)


class Block(nn.Module):
    """Transformer block: AdaLN-modulated self-attn, cross-attn, MLP.

    Parity: minimal_v4_dit.py:998-1247. Each sub-layer:
      x <- x + gate * f(layer_norm(x) * (1 + scale) + shift)
    shift/scale/gate from SiLU+Linear( t_emb ) (+ shared adaln_lora term),
    chunked in (shift, scale, gate) order.
    """

    config: DiTConfig
    use_sparse_attn: bool = False
    # per-layer (window, stride, dilation, base_size) override
    na_override: Optional[tuple] = None

    @nn.compact
    def __call__(
        self, x_B_T_H_W_D, emb_B_T_D, crossattn_emb, rope_angles, adaln_lora_B_T_3D, kv_cache=None, camera=None,
        sparse_switch=None,
    ):
        """sparse_switch (scan_uniform): traced boolean choosing sparse NA
        vs dense attention at runtime — the block is configured for BOTH
        (use_sparse_attn=True supplies the NA geometry) and Attention
        lax.cond's between them, so each kernel compiles once per program."""
        cfg = self.config
        d = cfg.model_channels

        def mod(name):
            out = AdaLNModulation(d, 3, cfg.use_adaln_lora, cfg.adaln_lora_dim, name=name)(emb_B_T_D)
            if cfg.use_adaln_lora:
                out = out + adaln_lora_B_T_3D
            shift, scale, gate = jnp.split(out, 3, axis=-1)
            # (B, T, D) -> (B, T, 1, 1, D) for broadcasting over H, W
            rs = lambda a: a[:, :, None, None, :]
            return rs(shift), rs(scale), rs(gate)

        B, T, H, W, D = x_B_T_H_W_D.shape
        compute_dtype = cfg.dtype

        def modulated(x, shift, scale):
            return (layer_norm(x) * (1.0 + scale) + shift).astype(compute_dtype)

        # self attention
        shift_sa, scale_sa, gate_sa = mod("adaln_modulation_self_attn")
        normed = modulated(x_B_T_H_W_D, shift_sa, scale_sa)
        if cfg.camera_dim is not None and camera is not None:
            cam_emb = Dense(
                d, kernel_init=trunc_normal_init(1.0 / np.sqrt(cfg.camera_dim)), dtype=compute_dtype, name="cam_encoder"
            )(camera.astype(compute_dtype))
            normed = normed + cam_emb.astype(normed.dtype)
        attn_in = normed.reshape(B, T * H * W, D)
        frame_group = cfg.num_frame_per_block * H * W if cfg.temporal_causal else 0
        if self.na_override is not None:
            na_window, na_stride, na_dilation, na_base = self.na_override
        else:
            na_window, na_stride, na_dilation, na_base = (
                cfg.natten_window, cfg.natten_stride, cfg.natten_dilation, cfg.natten_base_size
            )
        if self.use_sparse_attn and na_base is not None:
            from cosmos_predict2_tpu.ops.neighborhood_attention import adaptive_na_parameters

            na_window, na_stride, na_dilation = adaptive_na_parameters(
                na_window, na_stride, (T, H, W), na_base, na_dilation
            )
        self_attn = Attention(
            d, None, cfg.num_heads, cfg.head_dim, dtype=compute_dtype,
            backend=cfg.atten_backend, cp_axis=cfg.cp_axis, cp_strategy=cfg.cp_strategy,
            frame_group=frame_group,
            na_video_size=(T, H, W) if self.use_sparse_attn else None,
            na_window=tuple(na_window), na_stride=tuple(na_stride),
            na_dilation=tuple(na_dilation),
            cache_window_rows=cfg.cache_na_window_rows,
            cache_grid=(H, W) if cfg.cache_na_window_rows > 0 else None,
            name="self_attn",
        )
        new_cache = None
        if kv_cache is not None:
            attn_out, new_cache = self_attn(attn_in, rope_angles=rope_angles, kv_cache=kv_cache)
        else:
            attn_out = self_attn(attn_in, rope_angles=rope_angles, sparse_switch=sparse_switch)
        x_B_T_H_W_D = x_B_T_H_W_D + gate_sa.astype(x_B_T_H_W_D.dtype) * attn_out.reshape(B, T, H, W, D).astype(x_B_T_H_W_D.dtype)

        # cross-VIEW attention (multiview_cross_dit.py:445-467): affine
        # LayerNorm -> CrossViewAttention -> ungated residual (o_proj is
        # zero-init, so this starts as identity)
        if cfg.enable_cross_view_attn and cfg.n_views > 1:
            assert cfg.cross_view_attn_map is not None, "enable_cross_view_attn needs cross_view_attn_map"
            V = cfg.n_views
            ln_w = self.param("ln_cross_view_scale", nn.initializers.ones, (D,))
            ln_b = self.param("ln_cross_view_bias", nn.initializers.zeros, (D,))
            xv = x_B_T_H_W_D.reshape(B, V, T // V, H, W, D)
            normed_v = (layer_norm(xv) * ln_w + ln_b).astype(compute_dtype)
            cv_out = CrossViewAttention(
                d,
                cfg.num_heads,
                cfg.head_dim,
                attn_map=cfg.cross_view_attn_map,
                dtype=compute_dtype,
                backend=cfg.atten_backend,
                name="cross_view_attn",
            )(normed_v)
            x_B_T_H_W_D = x_B_T_H_W_D + cv_out.reshape(B, T, H, W, D).astype(x_B_T_H_W_D.dtype)

        # cross attention (multiview: each view attends its own caption —
        # reference MultiViewCrossAttention, multiview_dit.py:40-56)
        shift_ca, scale_ca, gate_ca = mod("adaln_modulation_cross_attn")
        normed = modulated(x_B_T_H_W_D, shift_ca, scale_ca)
        attn_in = normed.reshape(B, T * H * W, D)
        ctx = crossattn_emb.astype(compute_dtype)
        V = cfg.n_views
        if V > 1:
            L = (T // V) * H * W
            attn_in = attn_in.reshape(B, V, L, D).transpose(1, 0, 2, 3).reshape(V * B, L, D)
            M = ctx.shape[1] // V
            ctx = ctx.reshape(B, V, M, -1).transpose(1, 0, 2, 3).reshape(V * B, M, -1)
        attn_out = Attention(
            d, cfg.crossattn_emb_channels, cfg.num_heads, cfg.head_dim,
            dtype=compute_dtype, backend=cfg.atten_backend, name="cross_attn",
        )(attn_in, context=ctx)
        if V > 1:
            L = (T // V) * H * W
            attn_out = attn_out.reshape(V, B, L, D).transpose(1, 0, 2, 3).reshape(B, T * H * W, D)
        x_B_T_H_W_D = x_B_T_H_W_D + gate_ca.astype(x_B_T_H_W_D.dtype) * attn_out.reshape(B, T, H, W, D).astype(x_B_T_H_W_D.dtype)

        # MLP
        shift_mlp, scale_mlp, gate_mlp = mod("adaln_modulation_mlp")
        normed = modulated(x_B_T_H_W_D, shift_mlp, scale_mlp)
        mlp_out = GPT2FeedForward(d, int(d * cfg.mlp_ratio), dtype=compute_dtype, name="mlp")(normed)
        x_B_T_H_W_D = x_B_T_H_W_D + gate_mlp.astype(x_B_T_H_W_D.dtype) * mlp_out.astype(x_B_T_H_W_D.dtype)
        if kv_cache is not None:
            return x_B_T_H_W_D, new_cache
        return x_B_T_H_W_D


def timestep_sinusoid(timesteps_B_T: jax.Array, num_channels: int) -> jax.Array:
    """Sinusoidal embedding with [cos, sin] order (minimal_v4_dit.py:731-748)."""
    half = num_channels // 2
    exponent = -np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    freqs = jnp.exp(exponent)
    args = timesteps_B_T.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepEmbedding(nn.Module):
    """Linear -> SiLU -> Linear. With AdaLN-LoRA the module returns
    (raw sinusoid, 3D LoRA term); without it (mlp output, None)
    (minimal_v4_dit.py:751-788)."""

    in_features: int
    out_features: int
    use_adaln_lora: bool

    @nn.compact
    def __call__(self, sample_B_T_D):
        std_in = 1.0 / np.sqrt(self.in_features)
        std_out = 1.0 / np.sqrt(self.out_features)
        emb = Dense(
            self.out_features,
            use_bias=not self.use_adaln_lora,
            kernel_init=trunc_normal_init(std_in),
            dtype=jnp.float32,
            name="linear_1",
        )(sample_B_T_D)
        emb = jax.nn.silu(emb)
        n_out = 3 * self.out_features if self.use_adaln_lora else self.out_features
        emb = Dense(n_out, kernel_init=trunc_normal_init(std_out), dtype=jnp.float32, name="linear_2")(emb)
        if self.use_adaln_lora:
            return sample_B_T_D, emb  # (emb_B_T_D = raw sinusoid, adaln_lora_B_T_3D)
        return emb, None


class ActionMlp(nn.Module):
    """Linear -> GELU(tanh) -> Linear, with biases (action DiT Mlp, :30-45)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        h = Dense(self.hidden, use_bias=True, dtype=jnp.float32, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=True)
        return Dense(self.out, use_bias=True, dtype=jnp.float32, name="fc2")(h)


def block_layout(cfg: DiTConfig) -> tuple[list, list]:
    """Per-block (use_sparse_attn, na_override) lists.

    Sparse/dense interleave semantics of the reference
    replace_selfattn_op_with_sparse_attn_op (minimal_v4_dit.py:1785-1797):
    n_dense_blocks evenly spread; or an explicit per-layer parameter list
    (sparse_14B.py:29-105).
    """
    na_overrides: list = [None] * cfg.num_blocks
    if cfg.natten_parameters is not None:
        assert len(cfg.natten_parameters) == cfg.num_blocks, (
            len(cfg.natten_parameters), cfg.num_blocks)
        sparse = [p is not None for p in cfg.natten_parameters]
        na_overrides = [tuple(p) if p is not None else None for p in cfg.natten_parameters]
    elif cfg.n_dense_blocks == -1:
        sparse = [False] * cfg.num_blocks
    elif cfg.n_dense_blocks == 0:
        sparse = [True] * cfg.num_blocks
    elif cfg.n_dense_blocks == 1:
        sparse = [i != cfg.num_blocks // 2 for i in range(cfg.num_blocks)]
    else:
        dense_idx = set(np.linspace(0, cfg.num_blocks - 1, cfg.n_dense_blocks, dtype=int).tolist())
        sparse = [i not in dense_idx for i in range(cfg.num_blocks)]
    return sparse, na_overrides


def block_segments(cfg: DiTConfig) -> list[tuple[int, int]]:
    """(start, count) runs of consecutive blocks with identical static
    config — each run compiles to ONE scanned body under scan_blocks.
    Dense nets give a single (0, num_blocks) segment; the sparse_2B
    interleave alternates short dense/sparse runs — unless scan_uniform,
    which folds the whole interleave into one segment (the dense/sparse
    choice moves to a scanned runtime flag)."""
    sparse, na_overrides = block_layout(cfg)
    if getattr(cfg, "scan_uniform", False) and any(sparse) and all(o is None for o in na_overrides):
        return [(0, cfg.num_blocks)]
    segs: list[list[int]] = []
    for i in range(cfg.num_blocks):
        key = (sparse[i], na_overrides[i])
        if segs and segs[-1][2] == key:
            segs[-1][1] += 1
        else:
            segs.append([i, 1, key])
    return [(s, c) for s, c, _ in segs]


class ScanBlock(nn.Module):
    """lax.scan body for scan-over-blocks: one Block with the segment's
    static config, returning the (carry, ()) pair nn.scan expects.
    Remat composes inside the scan (prevent_cse=False — CSE prevention is
    unnecessary under scan and blocks XLA's loop optimizations)."""

    config: DiTConfig
    use_sparse_attn: bool = False
    na_override: Optional[tuple] = None
    uniform: bool = False  # scanned per-block dense/sparse flag (last arg)

    @nn.compact
    def __call__(self, x, emb_B_T_D, crossattn_emb, rope_angles, adaln_lora_B_T_3D, camera, sparse_flag=None):
        cfg = self.config
        if cfg.remat == "selective":
            cls = nn.remat(
                Block, static_argnums=(), prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names("attn_out"),
            )
        elif cfg.remat == "none":
            cls = Block
        else:  # "block" (default)
            cls = nn.remat(Block, static_argnums=(), prevent_cse=False)
        x = cls(cfg, use_sparse_attn=self.use_sparse_attn, na_override=self.na_override, name="block")(
            x, emb_B_T_D, crossattn_emb, rope_angles, adaln_lora_B_T_3D, camera=camera,
            sparse_switch=sparse_flag if self.uniform else None,
        )
        return x, ()


class FinalLayer(nn.Module):
    """AdaLN(2 chunks) + linear head (minimal_v4_dit.py:916-995)."""

    config: DiTConfig

    @nn.compact
    def __call__(self, x_B_T_H_W_D, emb_B_T_D, adaln_lora_B_T_3D):
        cfg = self.config
        d = cfg.model_channels
        out = AdaLNModulation(d, 2, cfg.use_adaln_lora, cfg.adaln_lora_dim, name="adaln_modulation")(emb_B_T_D)
        if cfg.use_adaln_lora:
            out = out + adaln_lora_B_T_3D[:, :, : 2 * d]
        shift, scale = jnp.split(out, 2, axis=-1)
        shift = shift[:, :, None, None, :]
        scale = scale[:, :, None, None, :]
        x = (layer_norm(x_B_T_H_W_D) * (1.0 + scale) + shift).astype(cfg.dtype)
        o = cfg.patch_spatial * cfg.patch_spatial * cfg.patch_temporal * cfg.out_channels
        return Dense(o, kernel_init=trunc_normal_init(1.0 / np.sqrt(d)), dtype=cfg.dtype, name="linear")(x)


class MiniTrainDIT(nn.Module):
    """The full video DiT. Input x: (B, C, T, H, W); timesteps: (B,) or (B, T)."""

    config: DiTConfig

    @nn.compact
    def __call__(
        self,
        x_B_C_T_H_W: jax.Array,
        timesteps_B_T: jax.Array,
        crossattn_emb: jax.Array,
        fps: Optional[jax.Array] = None,
        padding_mask: Optional[jax.Array] = None,
        condition_mask: Optional[jax.Array] = None,  # (B, 1, T, H, W)
        action: Optional[jax.Array] = None,  # (B, T_act, action_dim)
        view_indices_B_T: Optional[jax.Array] = None,  # (B, V*Tv) ints
        camera: Optional[jax.Array] = None,  # (B, Tt, Hp, Wp, camera_dim)
        kv_caches: Optional[list] = None,  # streaming decode: one per block
        t_start: jax.Array | int = 0,  # absolute latent-frame offset (decode)
        intermediate_feature_ids: Optional[tuple[int, ...]] = None,  # GAN head taps
    ) -> jax.Array:
        cfg = self.config
        B, C, T, H, W = x_B_C_T_H_W.shape
        ps, pt = cfg.patch_spatial, cfg.patch_temporal

        if cfg.concat_condition_mask:
            if condition_mask is None:
                condition_mask = jnp.zeros((B, 1, T, H, W), dtype=x_B_C_T_H_W.dtype)
            x_B_C_T_H_W = jnp.concatenate([x_B_C_T_H_W, condition_mask.astype(x_B_C_T_H_W.dtype)], axis=1)
            C = C + 1
        if cfg.timestep_scale != 1.0:
            timesteps_B_T = timesteps_B_T * cfg.timestep_scale

        # ---- patch embed (with optional padding-mask channel) ----
        if cfg.concat_padding_mask:
            if padding_mask is None:
                padding_mask = jnp.zeros((B, 1, H, W), dtype=x_B_C_T_H_W.dtype)
            elif padding_mask.shape[-2:] != (H, W):
                # nearest resize (reference uses torchvision nearest resize)
                padding_mask = jax.image.resize(padding_mask, padding_mask.shape[:-2] + (H, W), "nearest")
            mask = jnp.broadcast_to(padding_mask[:, :1, None, :, :], (B, 1, T, H, W)).astype(x_B_C_T_H_W.dtype)
            x_B_C_T_H_W = jnp.concatenate([x_B_C_T_H_W, mask], axis=1)
            C = C + 1

        if cfg.concat_view_embedding and cfg.n_views > 1:
            # per-view learned channels, concatenated LAST to match the
            # reference's channel order [x | cond | pad | view]
            # (multiview_dit.py:455-490: view concat happens inside
            # prepare_embedded_sequence, after the forward's cond-mask
            # concat and the padding-mask concat) — weight import of
            # x_embedder depends on this ordering.
            table = self.param(
                "view_embeddings",
                nn.initializers.normal(1.0),
                (cfg.n_cameras_emb, cfg.view_condition_dim),
            )
            V = cfg.n_views
            if view_indices_B_T is None:
                idx = jnp.clip(jnp.arange(V), 0, cfg.n_cameras_emb - 1)
                ve = table[idx]  # (V, Dv)
                ve = jnp.broadcast_to(ve[None, :, None, :, None, None], (B, V, T // V, cfg.view_condition_dim, H, W))
            else:
                idx = jnp.clip(view_indices_B_T.astype(jnp.int32), 0, cfg.n_cameras_emb - 1)
                ve = table[idx]  # (B, V*Tv, Dv)
                ve = ve.reshape(B, V, T // V, cfg.view_condition_dim)[..., None, None]
                ve = jnp.broadcast_to(ve, (B, V, T // V, cfg.view_condition_dim, H, W))
            ve = ve.reshape(B, T, cfg.view_condition_dim, H, W).transpose(0, 2, 1, 3, 4)
            x_B_C_T_H_W = jnp.concatenate([x_B_C_T_H_W, ve.astype(x_B_C_T_H_W.dtype)], axis=1)
            C = C + cfg.view_condition_dim

        # b c (t r) (h m) (w n) -> b t h w (c r m n)
        x = x_B_C_T_H_W.reshape(B, C, T // pt, pt, H // ps, ps, W // ps, ps)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # b t h w c r m n
        Tt, Hp, Wp = T // pt, H // ps, W // ps
        x = x.reshape(B, Tt, Hp, Wp, C * pt * ps * ps)
        patch_dim = C * pt * ps * ps
        x = Dense(
            cfg.model_channels,
            kernel_init=trunc_normal_init(1.0 / np.sqrt(patch_dim)),
            dtype=cfg.dtype,
            name="x_embedder",
        )(x)

        # ---- rope (multiview: identical per-view tables tiled over V,
        # MultiCameraVideoRopePosition3DEmb, multiview_dit.py:103-141) ----
        if cfg.n_views > 1:
            per_view = rope_angles_3d(cfg.rope_spec, Tt // cfg.n_views, Hp, Wp, fps=fps)
            rope_angles = jnp.tile(per_view, (cfg.n_views, 1))
        else:
            rope_angles = rope_angles_3d(cfg.rope_spec, Tt, Hp, Wp, fps=fps, t_start=t_start)

        # ---- timestep embedding ----
        if timesteps_B_T.ndim == 1:
            timesteps_B_T = timesteps_B_T[:, None]
        sin_emb = timestep_sinusoid(timesteps_B_T, cfg.model_channels)
        emb_B_T_D, adaln_lora_B_T_3D = TimestepEmbedding(
            cfg.model_channels, cfg.model_channels, cfg.use_adaln_lora, name="t_embedder"
        )(sin_emb)
        if cfg.action_dim is not None:
            if action is None:
                raise ValueError("config.action_dim set but no action passed")
            d = cfg.model_channels
            if cfg.action_per_latent_frame:
                # causal/interactive grouping (dit_action_causal.py:104-170):
                # (B, n_act, d_a) -> (B, t_act, na*d_a), embedded per latent
                # frame; the clip's frame 0 gets a zero action embedding.
                na = cfg.num_action_per_latent_frame
                t_act = action.shape[1] // na
                act = action.reshape(B, t_act, -1).astype(jnp.float32)
                act_emb = ActionMlp(d * 4, d, name="action_embedder_B_D")(act)
                act_emb_3d = ActionMlp(d * 4, 3 * d, name="action_embedder_B_3D")(act)
                t_emb = emb_B_T_D.shape[1]
                if t_act + 1 == t_emb:  # full clip: zero-pad frame 0
                    act_emb = jnp.concatenate([jnp.zeros_like(act_emb[:, :1]), act_emb], axis=1)
                    act_emb_3d = jnp.concatenate([jnp.zeros_like(act_emb_3d[:, :1]), act_emb_3d], axis=1)
                elif t_act != t_emb:  # streaming block past frame 0: 1:1
                    raise ValueError(
                        f"per-frame actions ({t_act} groups of {na}) must cover "
                        f"the {t_emb} timestep frames exactly or all but frame 0"
                    )
            else:
                act = action.reshape(B, 1, -1).astype(jnp.float32)  # b t d -> b 1 (t d)
                act_emb = ActionMlp(d * 4, d, name="action_embedder_B_D")(act)
                act_emb_3d = ActionMlp(d * 4, 3 * d, name="action_embedder_B_3D")(act)
            emb_B_T_D = emb_B_T_D + act_emb
            if adaln_lora_B_T_3D is not None:
                adaln_lora_B_T_3D = adaln_lora_B_T_3D + act_emb_3d
        emb_B_T_D = RMSNormParam(cfg.model_channels, name="t_embedding_norm")(emb_B_T_D.astype(jnp.float32))
        # broadcast per-frame modulation over latent frames
        if emb_B_T_D.shape[1] == 1 and Tt > 1:
            emb_B_T_D = jnp.broadcast_to(emb_B_T_D, (B, Tt, cfg.model_channels))
            if adaln_lora_B_T_3D is not None:
                adaln_lora_B_T_3D = jnp.broadcast_to(adaln_lora_B_T_3D, (B, Tt, 3 * cfg.model_channels))

        # ---- crossattn projection (Qwen hidden-state concat -> 1024) ----
        if cfg.use_crossattn_projection:
            crossattn_emb = Dense(
                cfg.crossattn_emb_channels,
                use_bias=True,
                kernel_init=nn.initializers.lecun_normal(),
                dtype=cfg.dtype,
                name="crossattn_proj",
            )(crossattn_emb)
            crossattn_emb = jax.nn.gelu(crossattn_emb, approximate=False)

        # ---- blocks ----
        block_cls = Block
        per_block_cls = None
        if kv_caches is None:
            full_cls = nn.remat(Block, static_argnums=())
            sel_cls = nn.remat(
                Block,
                static_argnums=(),
                policy=jax.checkpoint_policies.save_only_these_names("attn_out"),
            )
            if cfg.remat == "block":
                block_cls = full_cls
            elif cfg.remat == "selective":
                block_cls = sel_cls
            elif cfg.remat.startswith("mixed"):
                # "mixed:K" — save attention outputs (no attention recompute
                # in bwd) on the first K blocks, full block remat on the
                # rest: trades the HBM that fits for less recompute, between
                # the all-or-nothing policies (reference SAC policies are
                # similarly size-keyed, minimal_v4_dit.py:58-203)
                k = int(cfg.remat.split(":", 1)[1]) if ":" in cfg.remat else cfg.num_blocks // 2
                per_block_cls = [sel_cls if i < k else full_cls for i in range(cfg.num_blocks)]
        sparse, na_overrides = block_layout(cfg)

        use_scan = (
            cfg.scan_blocks
            and kv_caches is None
            and not intermediate_feature_ids
            and not cfg.remat.startswith("mixed")
        )
        if cfg.scan_blocks and not use_scan:
            # the stacked blocks_scan{start} parameter layout cannot drive
            # the unrolled blocks_i modules — failing here beats flax's
            # opaque ScopeParamNotFoundError deep in block 0
            raise ValueError(
                "scan_blocks=True is incompatible with kv-cache streaming, "
                "intermediate_feature_ids, and mixed:K remat; use "
                "scan_blocks=False and utils/scan_params.unstack_block_params "
                "to convert the parameters"
            )
        new_caches = [] if kv_caches is not None else None
        intermediates = []
        uniform = (
            use_scan
            and cfg.scan_uniform
            and any(sparse)
            and all(o is None for o in na_overrides)
        )
        if use_scan and cfg.scan_uniform and not uniform:
            # the flag was requested but the preconditions fail: fall back
            # to per-segment scanning LOUDLY — the segmented program is the
            # multi-copy-NA-kernel shape scan_uniform exists to avoid, and
            # the user otherwise only discovers this when compile blows up.
            from cosmos_predict2_tpu.utils import log

            reason = (
                "per-layer natten_parameters overrides present"
                if any(o is not None for o in na_overrides)
                else "net has no sparse blocks (n_dense_blocks covers all blocks)"
            )
            log.warning(
                f"scan_uniform=True requested but {reason}; falling back to "
                f"per-segment block scanning ({len(block_segments(cfg))} segments)"
            )
        if uniform:
            # ONE scan over all blocks; the dense/sparse interleave becomes
            # a scanned boolean driving lax.cond in Attention — each Mosaic
            # kernel (NA fwd/dq/dkv, flash) traces exactly once per program
            # instead of once per interleave segment.
            flags = jnp.asarray(np.asarray(sparse, dtype=bool))
            scanned = nn.scan(
                ScanBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast, 0),
                length=cfg.num_blocks,
            )(cfg, use_sparse_attn=True, uniform=True, name="blocks_scan0")
            x, _ = scanned(x, emb_B_T_D, crossattn_emb, rope_angles, adaln_lora_B_T_3D, camera, flags)
        elif use_scan:
            for start, count in block_segments(cfg):
                scanned = nn.scan(
                    ScanBlock,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    in_axes=nn.broadcast,
                    length=count,
                )(
                    cfg,
                    use_sparse_attn=sparse[start],
                    na_override=na_overrides[start],
                    name=f"blocks_scan{start}",
                )
                x, _ = scanned(x, emb_B_T_D, crossattn_emb, rope_angles, adaln_lora_B_T_3D, camera)
        else:
            for i in range(cfg.num_blocks):
                cls_i = per_block_cls[i] if per_block_cls is not None else block_cls
                block = cls_i(cfg, use_sparse_attn=sparse[i], na_override=na_overrides[i], name=f"blocks_{i}")
                if kv_caches is not None:
                    x, cache_i = block(x, emb_B_T_D, crossattn_emb, rope_angles, adaln_lora_B_T_3D, kv_cache=kv_caches[i])
                    new_caches.append(cache_i)
                else:
                    x = block(x, emb_B_T_D, crossattn_emb, rope_angles, adaln_lora_B_T_3D, camera=camera)
                if intermediate_feature_ids and i in intermediate_feature_ids:
                    intermediates.append(x.reshape(B, -1, cfg.model_channels))

        # ---- final layer + unpatchify ----
        x = FinalLayer(cfg, name="final_layer")(x, emb_B_T_D, adaln_lora_B_T_3D)
        # B T H W (p1 p2 t C) -> B C (T t) (H p1) (W p2)
        x = x.reshape(B, Tt, Hp, Wp, ps, ps, pt, cfg.out_channels)
        x = x.transpose(0, 7, 1, 6, 2, 4, 3, 5)  # b c t pt h p1 w p2
        x = x.reshape(B, cfg.out_channels, Tt * pt, Hp * ps, Wp * ps)
        if kv_caches is not None:
            return x, new_caches
        if intermediate_feature_ids:
            return x, intermediates
        return x


PRESETS: dict[str, DiTConfig] = {
    "2B": DiTConfig(),
    "14B": DiTConfig(model_channels=5120, num_heads=40, num_blocks=36),
    "mini": DiTConfig(model_channels=1024, num_heads=8, num_blocks=2),
    # tiny config for tests
    "test": DiTConfig(model_channels=384, num_heads=3, num_blocks=2, adaln_lora_dim=32),
}
