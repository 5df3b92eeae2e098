"""Serving stack tests: real HTTP requests against the in-process server."""

import dataclasses
import json
import time
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from cosmos_predict2_tpu.inference.api import Inference
    from cosmos_predict2_tpu.inference.pipeline import InferenceSetup, Video2WorldInference
    from cosmos_predict2_tpu.inference.serving import ModelServer
    from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
    from cosmos_predict2_tpu.networks.dit import PRESETS
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig

    net = dataclasses.replace(
        PRESETS["test"], dtype=jnp.float32, remat="none", model_channels=128, num_heads=2, adaln_lora_dim=16
    )
    setup = InferenceSetup(
        model_config=RFModelConfig(net=net, state_t=2, sampling_num_steps=2),
        vae_config=WanVAEConfig(dim=16, dtype=jnp.float32),
        size_override=(32, 32),
        text_len=8,
    )
    model = Video2WorldModel(setup.model_config)
    params = model.init_params(jax.random.PRNGKey(0), (1, 16, 2, 4, 4), text_len=8)
    vae = WanVAE(setup.vae_config)
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 5, 32, 32, 3)))
    pipe = Video2WorldInference(setup, params, vae_params, text_encoder=lambda p: jnp.ones((len(p), 8, 1024)) * 0.01)
    out_dir = str(tmp_path_factory.mktemp("serve_out"))
    srv = ModelServer(Inference(pipe, output_dir=out_dir), port=0)
    srv.serve_background()
    yield srv
    srv.shutdown()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return json.loads(r.read())


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


@pytest.mark.level(1)
def test_health(server):
    out = _get(server.port, "/health")
    assert out["status"] == "ok" and out["devices"] >= 1


@pytest.mark.level(1)
def test_generate_roundtrip(server):
    out = _post(server.port, "/generate", {"name": "job1", "prompt": "hello", "num_steps": 2, "guidance": 2.0})
    job_id = out["job_id"]
    for _ in range(600):
        status = _get(server.port, f"/status/{job_id}")
        if status["status"] in ("done", "error"):
            break
        time.sleep(0.5)
    assert status["status"] == "done", status
    assert status["output"] is not None


@pytest.mark.level(1)
def test_bad_requests(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server.port, "/status/nonexistent")
    assert exc.value.code == 404
    with pytest.raises(urllib.error.HTTPError):
        _get(server.port, "/bogus")


@pytest.mark.level(1)
def test_generate_image_mode(server):
    """POST /generate with mode=image produces a png via the job queue."""
    out = _post(server.port, "/generate", {"name": "img_job", "prompt": "a lighthouse",
                                           "mode": "image", "num_steps": 2, "guidance": 2.0})
    job_id = out["job_id"]
    for _ in range(600):
        status = _get(server.port, f"/status/{job_id}")
        if status["status"] in ("done", "error"):
            break
        time.sleep(0.5)
    assert status["status"] == "done", status
    assert status["output"].endswith(".png")
