"""Inference pipeline + public API tests (tiny configs, CPU)."""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.inference.api import Inference, InferenceArguments
from cosmos_predict2_tpu.inference.pipeline import (
    InferenceSetup,
    Video2WorldInference,
    read_and_process_image,
    resize_input,
)
from cosmos_predict2_tpu.models.video2world import RFModelConfig
from cosmos_predict2_tpu.networks.dit import PRESETS
from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAEConfig


@pytest.fixture(scope="module")
def pipe():
    net = dataclasses.replace(
        PRESETS["test"], dtype=jnp.float32, remat="none", model_channels=128, num_heads=2, adaln_lora_dim=16
    )
    setup = InferenceSetup(
        model_config=RFModelConfig(net=net, state_t=2, sampling_num_steps=2),
        vae_config=WanVAEConfig(dim=16, dtype=jnp.float32),
        resolution="480",
        text_len=8,
        size_override=(32, 32),
    )
    model_shape = (1, 16, 2, 4, 4)
    from cosmos_predict2_tpu.models.video2world import Video2WorldModel
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE

    model = Video2WorldModel(setup.model_config)
    params = model.init_params(jax.random.PRNGKey(0), model_shape, text_len=8)
    vae = WanVAE(setup.vae_config)
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 5, 32, 32, 3)))

    def fake_text_encoder(prompts):
        return jnp.ones((len(prompts), 8, 1024)) * 0.01

    return Video2WorldInference(setup, params, vae_params, text_encoder=fake_text_encoder)


@pytest.mark.level(0)
def test_resize_input_aspect_crop():
    frames = np.zeros((2, 100, 50, 3), dtype=np.uint8)  # tall
    out = resize_input(frames, 32, 32)
    assert out.shape == (2, 32, 32, 3)


@pytest.mark.level(1)
def test_image2world_generate(pipe, tmp_path):
    from PIL import Image

    img_path = str(tmp_path / "input.png")
    Image.fromarray(np.random.RandomState(0).randint(0, 255, (40, 64, 3), dtype=np.uint8)).save(img_path)

    # 5 pixel frames (state_t=2 -> 1+(T-1)/4=2 latents at T=5), tiny res
    video = read_and_process_image(img_path, 32, 32, 5)
    assert video.shape == (1, 3, 5, 32, 32)
    emb = pipe.encode_text(["a robot pouring coffee"])
    frames = pipe.generate_vid2world(video, emb, guidance=2.0, num_steps=2, num_conditional_frames=1)
    assert frames.shape == (5, 32, 32, 3)
    assert np.isfinite(frames).all()


@pytest.mark.level(1)
def test_public_api_batch(pipe, tmp_path):
    spec = [{"name": "s0", "prompt": "hello world", "num_steps": 2, "guidance": 2.0}]
    spec_path = str(tmp_path / "batch.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f)
    samples = InferenceArguments.from_file(spec_path)
    assert samples[0].prompt == "hello world"

    api = Inference(pipe, output_dir=str(tmp_path / "out"))
    # monkeypatch frame count small: pipeline uses state_t=2 -> 5 frames
    paths = api.generate(samples)
    assert len(paths) == 1 and os.path.exists(paths[0])


@pytest.mark.level(1)
def test_autoregressive_long_video(pipe):
    emb = pipe.encode_text(["driving"])
    video = np.random.RandomState(0).randint(0, 255, (1, 3, 5, 32, 32), dtype=np.uint8)
    frames = pipe.generate_autoregressive(
        video, emb, num_output_frames=8, chunk_size=5, chunk_overlap=1, num_steps=2, guidance=2.0
    )
    assert frames.shape == (8, 32, 32, 3)
    assert np.isfinite(frames).all()


@pytest.mark.level(0)
def test_batch_key_distinguishes_samplers():
    """Requests with different samplers must not share a batched pass (the
    batched program is the UniPC CFG sampler), and an all-dmd2 batch must
    not be routed through it either."""
    a = InferenceArguments(name="a", prompt="x", sampler="unipc")
    b = InferenceArguments(name="b", prompt="y", sampler="dmd2")
    assert Inference.batch_key(a) != Inference.batch_key(b)
    assert Inference.batch_key(b) == Inference.batch_key(
        InferenceArguments(name="c", prompt="z", sampler="dmd2")
    )


@pytest.mark.level(1)
def test_generate_batch_dmd2_uses_distilled_sampler(pipe, tmp_path, monkeypatch):
    """A same-key dmd2 batch falls back to per-sample generation (which
    honors sampler) instead of the UniPC batch program."""
    api = Inference(pipe, output_dir=str(tmp_path / "out"))
    called = []
    monkeypatch.setattr(
        pipe, "generate_vid2world_batch",
        lambda *a, **k: called.append("batch") or (_ for _ in ()).throw(AssertionError("batched pass ran")),
    )
    samples = [
        InferenceArguments(name=f"d{i}", prompt="p", sampler="dmd2", num_steps=2, guidance=2.0)
        for i in range(2)
    ]
    out = api.generate_batch(samples)
    assert set(out) == {"d0", "d1"}
    assert not called


@pytest.mark.level(0)
def test_text_guardrail_hook(pipe, tmp_path):
    api = Inference(pipe, output_dir=str(tmp_path), text_guardrail=lambda p: "bad" not in p, keep_going=False)
    with pytest.raises(ValueError, match="guardrail"):
        api._generate_sample(InferenceArguments(name="x", prompt="bad prompt", num_steps=1))


@pytest.mark.level(1)
def test_text2image_generate(pipe, tmp_path):
    from cosmos_predict2_tpu.inference.pipeline import Text2ImageInference

    t2i = Text2ImageInference(pipe.setup, pipe.params, pipe.vae_params, text_encoder=pipe.text_encoder)
    emb = t2i.encode_text(["a watercolor lighthouse"])
    img = t2i.generate_image(emb, guidance=3.0, num_steps=2, seed=7)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    out = t2i.save_image(img, str(tmp_path / "sample.png"))
    import os

    assert os.path.exists(out)


@pytest.mark.level(1)
def test_streaming_vae_pipeline_matches_oneshot(pipe):
    """streaming_vae=True (host-chunked VAE around the jitted sampler) must
    reproduce the one-shot jit path (full-scale 720p uses the streaming
    route because whole-clip decode exceeds HBM)."""
    stream_pipe = Video2WorldInference(
        dataclasses.replace(pipe.setup, streaming_vae=True),
        pipe.params,
        pipe.vae_params,
        text_encoder=pipe.text_encoder,
    )
    video = np.random.RandomState(3).randint(0, 255, (1, 3, 5, 32, 32), dtype=np.uint8)
    emb = pipe.encode_text(["a robot pouring coffee"])
    ref = pipe.generate_vid2world(video, emb, guidance=2.0, num_steps=2, seed=11)
    got = stream_pipe.generate_vid2world(video, emb, guidance=2.0, num_steps=2, seed=11)
    assert got.shape == ref.shape
    # streaming vs one-shot VAE agree to ~1e-4 per call; two sampling steps
    # amplify that to ~1e-2 on [-1,1] pixels. 2e-2 (not 1e-2): the exact
    # tail depends on XLA:CPU codegen details (fresh vs AOT-cached
    # executables vectorize reductions differently) — measured 1.15e-2 on
    # 0.03% of pixels in one environment, <1e-2 in another, same code.
    np.testing.assert_allclose(got, ref, atol=2e-2)


@pytest.mark.level(1)
def test_dmd2_sampler_path(pipe):
    """sampler="dmd2" routes through the distilled few-step TrigFlow
    generate (reference generate_samples_from_batch_dmd2): no CFG, finite
    frames, conditional frame replaced from the input."""
    video = np.random.RandomState(0).randint(0, 255, (1, 3, 5, 32, 32), dtype=np.uint8)
    emb = pipe.encode_text(["a robot pouring coffee"])
    frames = pipe.generate_vid2world(
        video, emb, num_steps=4, num_conditional_frames=1, sampler="dmd2"
    )
    assert frames.shape == (5, 32, 32, 3)
    assert np.isfinite(frames).all()


@pytest.mark.level(1)
def test_pixel_format_uint8_matches_float(pipe):
    """pixel_format="uint8" (the production api.py route: device-side
    quantization on the streaming decode, uint8 guardrails + writer) must
    agree with quantizing the float route on the host — on both the
    one-shot jit path and the streaming-VAE path."""
    video = np.random.RandomState(5).randint(0, 255, (1, 3, 5, 32, 32), dtype=np.uint8)
    emb = pipe.encode_text(["a robot pouring coffee"])
    f = pipe.generate_vid2world(video, emb, guidance=2.0, num_steps=2, seed=3)
    u = pipe.generate_vid2world(video, emb, guidance=2.0, num_steps=2, seed=3, pixel_format="uint8")
    assert u.dtype == np.uint8 and u.shape == f.shape
    want = np.round((np.clip(f, -1, 1) + 1) * 127.5).astype(np.int32)
    assert np.abs(want - u.astype(np.int32)).max() <= 1  # float-order-of-ops LSB

    stream_pipe = Video2WorldInference(
        dataclasses.replace(pipe.setup, streaming_vae=True),
        pipe.params, pipe.vae_params, text_encoder=pipe.text_encoder,
    )
    fs = stream_pipe.generate_vid2world(video, emb, guidance=2.0, num_steps=2, seed=3)
    us = stream_pipe.generate_vid2world(video, emb, guidance=2.0, num_steps=2, seed=3, pixel_format="uint8")
    assert us.dtype == np.uint8 and us.shape == fs.shape
    want_s = np.round((np.clip(fs, -1, 1) + 1) * 127.5).astype(np.int32)
    assert np.abs(want_s - us.astype(np.int32)).max() <= 1


@pytest.mark.level(0)
def test_save_img_or_video_uint8_passthrough(tmp_path):
    """uint8 frames are written as-is (no double rescale): a mid-gray uint8
    clip must not come back washed out."""
    from cosmos_predict2_tpu.utils.io import read_video, save_img_or_video

    frames = np.full((3, 16, 16, 3), 127, dtype=np.uint8)
    path = save_img_or_video(frames, str(tmp_path / "clip"), fps=4)
    back, _ = read_video(path)
    assert abs(int(back.astype(np.int32).mean()) - 127) <= 2
