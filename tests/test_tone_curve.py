"""Tone-curve / background-recolor parity against the ACTUAL reference
numpy code (imaginaire/utils/tone_curve.py, replace_bg_color.py) via the
reference-shim import path."""

import numpy as np
import pytest

from cosmos_predict2_tpu.utils import tone_curve as tc


def _ref_tone():
    from tests.reference_shims import import_reference

    return import_reference("cosmos_predict2._src.imaginaire.utils.tone_curve")


def _ref_bg():
    from tests.reference_shims import import_reference

    return import_reference("cosmos_predict2._src.imaginaire.utils.replace_bg_color")


@pytest.mark.level(0)
def test_srgb_transfer_roundtrip_and_parity():
    ref = _ref_tone()
    x = np.linspace(0.0, 1.0, 257, dtype=np.float64)
    np.testing.assert_allclose(tc.srgb_to_linear(x), ref.srgb2lin(x), atol=1e-12)
    np.testing.assert_allclose(tc.linear_to_srgb(x), ref.lin2srgb(x), atol=1e-12)
    np.testing.assert_allclose(tc.linear_to_srgb(tc.srgb_to_linear(x)), x, atol=1e-9)


@pytest.mark.level(0)
def test_commerce_tonemap_parity():
    ref = _ref_tone()
    rng = np.random.default_rng(0)
    color = rng.uniform(0.0, 4.0, size=(32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(
        tc.commerce_tonemap(color.copy()), ref.commerce_tonemap(color.copy()), atol=1e-6
    )


@pytest.mark.level(0)
def test_autoexposure_parity():
    ref = _ref_tone()
    rng = np.random.default_rng(1)
    img = rng.uniform(0.0, 2.0, size=(70, 83, 3)).astype(np.float32)  # non-multiple of 16
    mask = (rng.uniform(size=(70, 83, 1)) > 0.3).astype(np.float32)
    got = tc.autoexposure(img, mask)
    want = ref.autoexposure(img.copy(), mask.copy())
    assert got == pytest.approx(want, rel=1e-6)
    # fully-masked image -> neutral exposure 1.0
    assert tc.autoexposure(img, np.zeros_like(mask)) == 1.0


@pytest.mark.level(0)
def test_apply_tone_curve_pil_parity():
    from PIL import Image

    ref = _ref_tone()
    rng = np.random.default_rng(2)
    imgs = [Image.fromarray(rng.integers(0, 256, (64, 48, 4), dtype=np.uint8)) for _ in range(2)]
    for in_map, out_map in (("log", "commerce"), ("straight", "straight"), ("straight", "log")):
        got_imgs, got_exp = tc.apply_tone_curve(
            [im.copy() for im in imgs], input_mapping=in_map, output_mapping=out_map
        )
        want_imgs, want_exp = ref.apply_tone_curve(
            [im.copy() for im in imgs], input_mapping=in_map, output_mapping=out_map
        )
        assert got_exp == pytest.approx(want_exp, rel=1e-6)
        for g, w in zip(got_imgs, want_imgs):
            # uint8 rounding at the clip boundary may differ by 1 code value
            assert np.max(np.abs(np.asarray(g).astype(int) - np.asarray(w).astype(int))) <= 1


@pytest.mark.level(0)
def test_apply_exposure_parity():
    from PIL import Image

    ref = _ref_tone()
    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
    got = np.asarray(tc.apply_exposure(img.copy(), 1.7))
    want = np.asarray(ref.apply_exposure(img.copy(), 1.7))
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1


@pytest.mark.level(0)
def test_replace_bg_color_parity_and_semantics():
    ref = _ref_bg()
    rng = np.random.default_rng(4)
    fg = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    mask = rng.integers(0, 256, (16, 16, 1), dtype=np.uint8)
    got = tc.replace_bg_color_u8(fg, mask, [255, 255, 255], [0, 128, 0])
    want = ref.replace_bg_color_u8(fg.copy(), mask.copy(), [255, 255, 255], [0, 128, 0])
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1
    # full-foreground pixels are untouched; full-background become the new color
    fg2 = np.full((4, 4, 3), 200, np.uint8)
    all_fg = tc.replace_bg_color_u8(fg2, np.full((4, 4, 1), 255, np.uint8), [255] * 3, [10, 20, 30])
    np.testing.assert_array_equal(all_fg, fg2)
    white = np.full((4, 4, 3), 255, np.uint8)
    all_bg = tc.replace_bg_color_u8(white, np.zeros((4, 4, 1), np.uint8), [255] * 3, [10, 20, 30])
    assert np.max(np.abs(all_bg.astype(int) - np.array([10, 20, 30]))) <= 1
