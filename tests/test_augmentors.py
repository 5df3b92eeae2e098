"""Augmentor zoo (data/augmentors.py) — parity with the reference's
webdataset augmentor stack (imaginaire/datasets/webdataset/augmentors/,
predict2/datasets/augmentors/)."""

import io
import tarfile

import numpy as np
import pytest

from cosmos_predict2_tpu.data.augmentors import (
    AppendFPSFramesForImage,
    CaptionFilter,
    CenterCrop,
    HorizontalFlip,
    MergeDataDict,
    Normalize,
    RandomCrop,
    ReflectionPadding,
    ResizeLargestSide,
    ResizeSmallestSide,
    TextTransform,
    UniformTemporalSubsample,
    VideoParsing,
    apply_augmentors,
)


def _video(t=8, h=32, w=48):
    return np.arange(t * h * w * 3, dtype=np.int64).reshape(t, h, w, 3).astype(np.uint8)


@pytest.mark.level(0)
def test_resize_smallest_and_largest():
    d = {"video": _video(), "__key__": "a"}
    out = ResizeSmallestSide(["video"], args={"size": 16})(dict(d))
    assert out["video"].shape == (8, 16, 24, 3)
    out = ResizeLargestSide(["video"], args={"size": 24})(dict(d))
    assert out["video"].shape == (8, 16, 24, 3)


@pytest.mark.level(0)
def test_center_and_random_crop():
    d = {"video": _video(), "__key__": "a"}
    out = CenterCrop(["video"], args={"height": 16, "width": 20})(dict(d))
    assert out["video"].shape == (8, 16, 20, 3)
    out = RandomCrop(["video"], args={"height": 16, "width": 20})(dict(d))
    assert out["video"].shape == (8, 16, 20, 3)
    # deterministic per key
    out2 = RandomCrop(["video"], args={"height": 16, "width": 20})({"video": _video(), "__key__": "a"})
    np.testing.assert_array_equal(out["video"], out2["video"])
    # too-small input rejects
    assert RandomCrop(["video"], args={"height": 99, "width": 20})({"video": _video(), "__key__": "a"}) is None


@pytest.mark.level(0)
def test_flip_normalize_padding():
    d = {"video": _video(), "__key__": "flipme"}
    out = HorizontalFlip(["video"], args={"prob": 1.0})(dict(d))
    np.testing.assert_array_equal(out["video"], d["video"][..., ::-1, :])

    out = Normalize(["video"])(dict(d))
    assert out["video"].dtype == np.float32
    assert -1.0 <= out["video"].min() and out["video"].max() <= 1.0

    out = ReflectionPadding(["video"], args={"height": 40, "width": 64})(dict(d))
    assert out["video"].shape == (8, 40, 64, 3)
    assert out["padding_mask"].shape == (40, 64)
    assert out["padding_mask"].sum() > 0  # padded border marked


@pytest.mark.level(0)
def test_temporal_subsample_and_image_to_video():
    d = {"video": _video(t=9)}
    out = UniformTemporalSubsample(["video"], args={"num_frames": 3})(dict(d))
    assert out["video"].shape[0] == 3
    np.testing.assert_array_equal(out["video"][0], d["video"][0])
    np.testing.assert_array_equal(out["video"][-1], d["video"][-1])

    img = {"image": _video(t=1)[0]}
    out = AppendFPSFramesForImage(["image"], args={"num_video_frames": 4, "fps": 24})(img)
    assert out["video"].shape == (4, 32, 48, 3) and out["fps"] == 24


@pytest.mark.level(0)
def test_video_parsing_window_selection():
    frames = _video(t=20)
    meta = {
        "framerate": 10,
        "nb_frames": 20,
        "t2w_windows": [
            {"start_frame": 0, "end_frame": 10},
            {"start_frame": 10, "end_frame": 20},
        ],
    }
    d = {"metas": meta, "mp4": frames, "__key__": "vid1"}
    out = VideoParsing(
        ["metas", "mp4"],
        args={"num_video_frames": 5, "min_fps": 1, "max_fps": 60, "min_duration": 0.5},
    )(d)
    assert out is not None and out["video"].shape[0] == 5 and out["fps"] == 10
    # fps gate rejects
    bad = {"metas": {**meta, "framerate": 500}, "mp4": frames, "__key__": "v"}
    assert (
        VideoParsing(["metas", "mp4"], args={"num_video_frames": 5, "min_fps": 1, "max_fps": 60, "min_duration": 0})(bad)
        is None
    )


@pytest.mark.level(0)
def test_text_transform_and_filters():
    d = {"captions": [{"caption": "first window"}, {"caption": "second window"}], "chunk_index": 1}
    out = TextTransform(["captions"])(dict(d))
    assert out["caption"] == "second window"

    assert CaptionFilter(["caption"], args={"min_words": 3})({"caption": "too short"}) is None
    assert CaptionFilter(["caption"], args={"min_words": 2})({"caption": "long enough"}) is not None

    out = MergeDataDict(["metas"])({"metas": {"fps": 10}, "x": 1})
    assert out == {"fps": 10, "x": 1}


@pytest.mark.level(0)
def test_chain_short_circuits():
    chain = [
        CenterCrop(["video"], args={"height": 16, "width": 16}),
        CaptionFilter(["caption"], args={"min_words": 2}),
        Normalize(["video"]),
    ]
    good = apply_augmentors({"video": _video(), "caption": "a good caption", "__key__": "k"}, chain)
    assert good is not None and good["video"].dtype == np.float32
    assert apply_augmentors({"video": _video(), "caption": "x", "__key__": "k"}, chain) is None


@pytest.mark.level(1)
def test_sharded_dataset_with_augmentors(tmp_path):
    from cosmos_predict2_tpu.data.loaders import ShardedTarDataset

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for i in range(3):
            npy = io.BytesIO()
            np.save(npy, _video(t=4, h=24, w=24))
            for name, data in ((f"{i:03d}.npy", npy.getvalue()), (f"{i:03d}.txt", f"caption number {i}".encode())):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    shard = tmp_path / "s.tar"
    shard.write_bytes(buf.getvalue())

    ds = ShardedTarDataset(
        [str(shard)],
        shuffle_seed=None,
        augmentors=[
            MergeDataDict([]),
            CenterCrop(["npy"], output_keys=["video"], args={"height": 16, "width": 16}),
            CaptionFilter(["txt"], args={"min_words": 2}),
            Normalize(["video"]),
        ],
    )
    got = [next(iter_) for iter_, _ in ((iter(ds), 0),) for _ in range(3)]
    assert all(s["video"].shape == (4, 16, 16, 3) for s in got)
    assert all(s["video"].dtype == np.float32 for s in got)
