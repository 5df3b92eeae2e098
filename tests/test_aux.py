"""Aux subsystem tests: guardrails, checkpoint DB, callbacks, data loaders,
profiling timers."""

import io
import os
import tarfile
import time

import numpy as np
import pytest

from cosmos_predict2_tpu.callbacks.callbacks import HeartBeat, StragglerDetection, basic_callbacks
from cosmos_predict2_tpu.data.loaders import (
    CachedReplayDataLoader,
    IterativeJointDataLoader,
    OperationWatchdog,
    ShardedTarDataset,
)
from cosmos_predict2_tpu.utils.checkpoint_db import get_checkpoint_by_uuid, list_checkpoints
from cosmos_predict2_tpu.utils.guardrails import (
    BlocklistChecker,
    GuardrailConfig,
    GuardrailRunner,
    pixelate_region,
)
from cosmos_predict2_tpu.utils.profiling import TrainingTimer


@pytest.mark.level(0)
def test_blocklist():
    checker = BlocklistChecker(("gore", "explosion"))
    assert checker.is_safe("a robot pouring coffee")
    assert not checker.is_safe("extreme GORE footage")
    # the lemma pass catches inflected forms of blocked lemmas
    # (reference blocklist.py:216-221)
    assert not checker.is_safe("massive explosions scene")


@pytest.mark.level(0)
def test_guardrail_runner_hooks():
    cfg = GuardrailConfig(llm_classifier=lambda p: "evil" not in p)
    runner = GuardrailRunner(cfg)
    assert runner.run_text_guardrail("nice prompt")
    assert not runner.run_text_guardrail("evil prompt")
    frames = np.zeros((2, 16, 16, 3), dtype=np.uint8)
    out = runner.run_video_guardrail(frames)
    assert out is not None and out.shape == frames.shape
    runner2 = GuardrailRunner(GuardrailConfig(video_classifier=lambda f: False))
    assert runner2.run_video_guardrail(frames) is None


@pytest.mark.level(0)
def test_pixelate():
    frame = np.arange(32 * 32 * 3, dtype=np.uint8).reshape(32, 32, 3)
    out = pixelate_region(frame, (4, 4, 20, 20), factor=4)
    assert out.shape == frame.shape
    assert not np.array_equal(out[4:20, 4:20], frame[4:20, 4:20])
    np.testing.assert_array_equal(out[:4], frame[:4])


@pytest.mark.level(0)
def test_checkpoint_db():
    # full release-registry mirror (reference checkpoint_db.py:190-704)
    entry = get_checkpoint_by_uuid("d20b7120-df3e-4911-919d-db6e08bad31c")
    assert entry.name == "nvidia/Cosmos-Predict2.5-2B/base/pre-trained"
    assert entry.experiment.startswith("Stage-c_pt_4-reason_embeddings-v1p1-Index-26")
    assert entry.hf_repo == "nvidia/Cosmos-Predict2.5-2B"
    assert len(list_checkpoints()) >= 22
    # name lookup + experiment lookup
    assert get_checkpoint_by_uuid("Wan2.1/vae").hf_filename == "tokenizer.pth"
    from cosmos_predict2_tpu.utils.checkpoint_db import find_by_experiment

    e = find_by_experiment("multicamera_video2video_rectified_flow_2b_res_720_fps16_s3_agibot")
    assert e is not None and e.variant == "robot_multiview"
    # every registered entry resolves by uuid AND name
    for e in list_checkpoints():
        assert get_checkpoint_by_uuid(e.uuid) is e


@pytest.mark.level(0)
def test_joint_loader_interleave():
    a = iter(lambda: {"x": 1}, None)
    b = iter(lambda: {"x": 2}, None)
    joint = IterativeJointDataLoader({"image": (a, 1), "video": (b, 2)})
    names = [batch["dataset_name"] for batch, _ in zip(joint, range(6))]
    assert names == ["image", "video", "video"] * 2


@pytest.mark.level(0)
def test_cached_replay():
    src = iter(range(10))
    loader = CachedReplayDataLoader(src, duplicate_batches=3)
    got = [x for x, _ in zip(loader, range(6))]
    assert got == [0, 0, 0, 1, 1, 1]
    loader.close()


@pytest.mark.level(0)
def test_sharded_tar_dataset(tmp_path):
    shard = tmp_path / "shard_000.tar"
    with tarfile.open(shard, "w") as tar:
        for i in range(3):
            data = io.BytesIO()
            np.save(data, np.full((2,), i))
            info = tarfile.TarInfo(f"{i:04d}.npy")
            info.size = len(data.getvalue())
            data.seek(0)
            tar.addfile(info, data)
            txt = f"caption {i}".encode()
            info = tarfile.TarInfo(f"{i:04d}.txt")
            info.size = len(txt)
            tar.addfile(info, io.BytesIO(txt))
    ds = ShardedTarDataset([str(shard)], shuffle_seed=None)
    samples = [s for s, _ in zip(ds, range(3))]
    assert samples[0]["txt"] == "caption 0"
    np.testing.assert_array_equal(samples[2]["npy"], [2, 2])
    # host sharding: 2 hosts, second host gets no shard
    ds2 = ShardedTarDataset([str(shard)], process_index=1, process_count=2)
    assert list(ds2) == []


@pytest.mark.level(0)
def test_straggler_detection_raises():
    cb = StragglerDetection(max_ratio=1.5, threshold_count=2, enabled=True)
    # seed the window with fast steps
    for _ in range(12):
        cb.on_training_step_start(None, None, None, 0)
        cb.window.append(0.01)
    with pytest.raises(RuntimeError, match="straggler"):
        for _ in range(3):
            cb.on_training_step_start(None, None, None, 0)
            time.sleep(0.05)
            cb.on_training_step_end(None, None, {}, 0)


@pytest.mark.level(0)
def test_heartbeat_and_timer(tmp_path):
    hb = HeartBeat(path=str(tmp_path / "hb.json"), every_n=1)
    hb.on_training_step_end(None, None, {}, 1)
    assert os.path.exists(tmp_path / "hb.json")

    timer = TrainingTimer()
    with timer("forward"):
        time.sleep(0.01)
    assert timer.summary()["forward"] >= 0.01
    assert len(basic_callbacks()) == 4


@pytest.mark.level(0)
def test_watchdog_beat():
    wd = OperationWatchdog(warn_after_s=100, poll_s=0.1)
    wd.beat("dataloading")
    assert wd._operation == "dataloading"
    wd.close()


@pytest.mark.level(0)
def test_easy_io_roundtrips(tmp_path):
    from cosmos_predict2_tpu.utils import easy_io

    d = {"a": 1, "b": [1, 2, 3]}
    p = str(tmp_path / "x.json")
    easy_io.dump(d, p)
    assert easy_io.load(p) == d

    arr = np.arange(6).reshape(2, 3)
    p = str(tmp_path / "x.npy")
    easy_io.dump(arr, p)
    np.testing.assert_array_equal(easy_io.load(p), arr)

    easy_io.dump({"v": arr}, str(tmp_path / "x.npz"))
    np.testing.assert_array_equal(easy_io.load(str(tmp_path / "x.npz"))["v"], arr)

    easy_io.dump("hello", str(tmp_path / "x.txt"))
    assert easy_io.load(str(tmp_path / "x.txt")) == "hello"

    easy_io.dump([["a", "b"], ["1", "2"]], str(tmp_path / "x.csv"))
    assert easy_io.load(str(tmp_path / "x.csv")) == [["a", "b"], ["1", "2"]]

    easy_io.dump([{"i": 0}, {"i": 1}], str(tmp_path / "x.jsonl"))
    assert easy_io.load(str(tmp_path / "x.jsonl")) == [{"i": 0}, {"i": 1}]

    easy_io.dump({"nested": {"k": [1, 2]}}, str(tmp_path / "x.pkl"))
    assert easy_io.load(str(tmp_path / "x.pkl")) == {"nested": {"k": [1, 2]}}

    easy_io.dump(d, str(tmp_path / "x.json.gz"))
    assert easy_io.load(str(tmp_path / "x.json.gz")) == d

    easy_io.dump(b"raw-bytes", str(tmp_path / "x.bin"))
    assert easy_io.load(str(tmp_path / "x.bin")) == b"raw-bytes"

    import tarfile
    with tarfile.open(str(tmp_path / "x.tar"), "w") as tf:
        tf.add(str(tmp_path / "x.txt"), arcname="x.txt")
    tf2 = easy_io.load(str(tmp_path / "x.tar"))
    assert "x.txt" in tf2.getnames()

    # s3/gs now have first-party backends (tests/test_remote_io.py);
    # unknown schemes still fail fast
    with pytest.raises(NotImplementedError, match="scheme"):
        easy_io.load("hdfs://bucket/key.json")
    assert easy_io.exists(p)


@pytest.mark.level(0)
def test_video_content_safety_filter():
    import torch
    import jax.numpy as jnp

    from cosmos_predict2_tpu.utils.guardrails import (
        VideoContentSafetyFilter,
        convert_safety_classifier_state_dict,
        safety_classifier_apply,
    )

    torch.manual_seed(0)
    D, NC = 16, 7
    layers = torch.nn.Sequential(
        torch.nn.Linear(D, 512), torch.nn.BatchNorm1d(512), torch.nn.ReLU(),
        torch.nn.Linear(512, 256), torch.nn.BatchNorm1d(256), torch.nn.ReLU(),
        torch.nn.Linear(256, NC),
    ).eval()
    # give BN non-trivial running stats
    with torch.no_grad():
        layers(torch.randn(32, D))
    sd = {f"network.layers.{k}": v for k, v in layers.state_dict().items()}
    params = convert_safety_classifier_state_dict(sd)

    x = torch.randn(5, D)
    with torch.no_grad():
        want = layers(x).numpy()
    got = np.asarray(safety_classifier_apply(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    # end-to-end filter with a fake embedder: all frames map to one embedding
    emb = x[:1].numpy()
    safe_cls = int(want[0].argmax())
    filt = VideoContentSafetyFilter(
        embed_frames=lambda frames: np.repeat(emb, len(frames), axis=0),
        classifier_params=params, sample_every=1,
    )
    frames = np.zeros((4, 8, 8, 3), dtype=np.uint8)
    assert filt.is_safe_frames(frames) == (safe_cls == 0)
