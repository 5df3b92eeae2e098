"""Decoder zoo (data/decoders.py) vs the reference's decode semantics
(imaginaire/datasets/webdataset/decoders/*, predict2/datasets/decoders/
video_decoder.py): extension gating, chunk sampling, lowered-fps stride
selection, and the end-to-end chunked video decoders on a synthetic
reader (this image has no mp4 codec)."""

import io
import pickle

import numpy as np
import pytest

from cosmos_predict2_tpu.data import decoders as dz


def test_image_decoder_roundtrip_and_gating():
    from PIL import Image

    img = np.random.default_rng(0).integers(0, 255, (16, 20, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    out = dz.pil_image_decoder("sample.png", buf.getvalue())
    np.testing.assert_array_equal(out, img)
    assert dz.pil_image_decoder("sample.txt", b"not an image") is None


def test_pickle_decoder():
    payload = {"a": 1, "b": [2, 3]}
    assert dz.pickle_decoder("x.pkl", pickle.dumps(payload)) == payload
    assert dz.pickle_decoder("x.json", b"{}") is None


def test_depth_decoder_npz_fills_nan():
    d = np.full((4, 6), 2.5, np.float32)
    d[0, 0] = np.nan
    buf = io.BytesIO()
    np.savez(buf, depth=d)
    out = dz.depth_decoder("x.npz", buf.getvalue())
    assert out.shape == (1, 4, 6)
    assert out[0, 0, 0] == dz.MAX_DEPTH and out[0, 1, 1] == 2.5
    with pytest.raises(RuntimeError):
        dz.depth_decoder("x.exr", b"")


@pytest.mark.parametrize(
    "n,target,chunk", [(100, 10, 30), (100, 10, 100), (95, 10, 30), (45, 40, 30)]
)
def test_sample_chunk_index_bounds(n, target, chunk):
    rng = np.random.default_rng(0)
    for _ in range(50):
        try:
            idx, frames = dz.sample_chunk_index(n, target, chunk, rng)
        except ValueError:
            continue  # legitimately too short a chunk for this request
        start = idx * chunk
        assert frames >= target
        assert start + frames <= n or idx == max(n // chunk, 1) - 1 or frames == chunk
        assert start < n


def test_sample_chunk_index_tail_becomes_chunk():
    """A >= chunk_size/2 tail with > target frames counts as its own chunk
    (reference sample_chunk_index_from_chunked_video docstring)."""
    rng = np.random.default_rng(1)
    seen = {dz.sample_chunk_index(80, 5, 30, rng)[0] for _ in range(200)}
    assert seen == {0, 1, 2}  # 2 full chunks + 20-frame tail (>= 15, > 5)


def test_lowered_fps_prefers_large_stride():
    rng = np.random.default_rng(2)
    strides = set()
    for _ in range(300):
        idx, fps = dz.lowered_fps_indices(100, 30, 4, 30, 5, rng)
        assert len(idx) == 5 and idx[-1] < 100 and idx[0] >= 0
        stride = idx[1] - idx[0]
        assert idx == [idx[0] + i * stride for i in range(5)]
        assert 4 <= fps <= 30 and fps == 30 / stride
        strides.add(stride)
    # valid strides are 1..7 (fps 30/s >= 4 -> s <= 7); weights [0.01, 0.99]
    # on the two largest -> 7 dominates, 6 appears, small strides never
    assert 7 in strides and strides <= {6, 7}


def test_lowered_fps_no_valid_stride_raises():
    with pytest.raises(ValueError):
        dz.lowered_fps_indices(10, 60, 1, 2, 9, np.random.default_rng(0))  # stride 1 -> fps 60 > 2


def _synthetic_reader(n=64, fps=30.0):
    frames = np.arange(n, dtype=np.uint8)[:, None, None, None] * np.ones((1, 4, 4, 3), np.uint8)
    return lambda ext, data: (frames, fps)


def test_chunked_video_decoder_contiguous():
    dec = dz.get_video_decoder(
        "chunked_video_decoder", chunk_size=16, sequence_length=8, seed=3, read_fn=_synthetic_reader()
    )
    out = dec("clip.mp4", b"")
    assert out["video"].shape == (8, 4, 4, 3)
    ids = out["video"][:, 0, 0, 0].astype(int)
    assert list(ids) == list(range(ids[0], ids[0] + 8))  # contiguous
    assert out["fps"] == 30.0 and out["num_frames"] == 8
    assert out["frame_start"] == ids[0] and out["frame_end"] == ids[-1] + 1
    assert out["frame_start"] >= out["chunk_index"] * 16
    assert dec("clip.txt", b"") is None


def test_chunked_video_decoder_lower_fps_strides():
    dec = dz.get_video_decoder(
        "chunked_video_decoder_w_lower_fps",
        sequence_length=8, min_fps_thres=4, max_fps_thres=30, seed=4,
        read_fn=_synthetic_reader(),
    )
    out = dec("clip.webm", b"")
    ids = out["video"][:, 0, 0, 0].astype(int)
    stride = ids[1] - ids[0]
    assert stride > 1  # 99% preference for the largest stride
    assert out["fps"] == 30.0 / stride and out["orig_fps"] == 30.0


def test_video_naive_bytes_passthrough():
    dec = dz.get_video_decoder("video_naive_bytes")
    assert dec("a.mov", b"\x00\x01") == b"\x00\x01"
    assert dec("a.npy", b"\x00\x01") is None


def test_loader_default_decoders_include_zoo():
    from cosmos_predict2_tpu.data.loaders import ShardedTarDataset

    ds = ShardedTarDataset([])
    assert "jpg" in ds.decoders and "pkl" in ds.decoders
    from PIL import Image

    img = np.zeros((4, 4, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    np.testing.assert_array_equal(ds.decoders["jpg"](buf.getvalue()).shape, (4, 4, 3))
