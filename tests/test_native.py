"""Native (C++) media ops tests: build, correctness vs NumPy, speed."""

import time

import numpy as np
import pytest

from cosmos_predict2_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


@pytest.mark.level(0)
def test_native_builds(lib):
    assert lib is not None


@pytest.mark.level(0)
def test_center_crop_matches_numpy(lib):
    frames = np.random.RandomState(0).randint(0, 256, (3, 20, 24, 3), dtype=np.uint8)
    got = native.center_crop(frames, 10, 12)
    top, left = 5, 6
    np.testing.assert_array_equal(got, frames[:, top : top + 10, left : left + 12])


@pytest.mark.level(0)
def test_resize_matches_numpy_fallback(lib):
    frames = np.random.RandomState(1).randint(0, 256, (2, 32, 48, 3), dtype=np.uint8)
    got = native.resize_bilinear(frames, 16, 24)
    # compute the numpy fallback by bypassing the lib
    native_lib = native._lib
    native._lib = None
    try:
        expected = native.resize_bilinear(frames, 16, 24)
    finally:
        native._lib = native_lib
    diff = np.abs(got.astype(int) - expected.astype(int))
    assert diff.max() <= 1  # rounding differences only


@pytest.mark.level(0)
def test_to_pm1(lib):
    x = np.array([0, 127, 255], dtype=np.uint8)
    got = native.to_pm1_float(x)
    np.testing.assert_allclose(got, x.astype(np.float32) / 127.5 - 1.0, atol=1e-6)


@pytest.mark.level(2)  # timing assertion; flaky when the single host core is shared
def test_native_resize_faster_than_pil(lib):
    from PIL import Image

    frames = np.random.RandomState(2).randint(0, 256, (16, 360, 640, 3), dtype=np.uint8)

    t0 = time.perf_counter()
    native.resize_bilinear(frames, 704, 1280)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for f in frames:
        np.asarray(Image.fromarray(f).resize((1280, 704), Image.BILINEAR))
    t_pil = time.perf_counter() - t0
    # informational: native should be competitive (PIL uses SIMD too)
    print(f"native {t_native:.3f}s vs PIL {t_pil:.3f}s")
    assert t_native < t_pil * 3


@pytest.mark.level(0)
def test_native_tar_reader(tmp_path):
    import tarfile

    from cosmos_predict2_tpu.data.native_tar import NativeTarShard, get_lib

    payloads = {f"sample_{i:03d}.bin": bytes([i]) * (100 + i * 37) for i in range(12)}
    # include a long (>100 char) name to exercise GNU longname handling
    long_name = "deep/" + "x" * 120 + ".bin"
    payloads[long_name] = b"L" * 999
    tar_path = str(tmp_path / "shard.tar")
    with tarfile.open(tar_path, "w", format=tarfile.GNU_FORMAT) as tf:
        for name, data in payloads.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            import io as _io

            tf.addfile(info, _io.BytesIO(data))

    shard = NativeTarShard(tar_path)
    assert get_lib() is not None  # toolchain exists in this image
    assert len(shard) == len(payloads)
    names = shard.names
    assert set(names) == set(payloads)
    for i, n in enumerate(names):
        assert shard.read(i) == payloads[n]

    # threaded prefetch returns identical bytes
    order = list(range(len(names)))[::-1]
    shard.prefetch(order)
    for slot, idx in enumerate(order):
        assert shard.get_prefetched(slot) == payloads[names[idx]]
    shard.end_prefetch()
    shard.close()
