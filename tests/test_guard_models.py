"""Model-backed guardrails (VERDICT r1 #8): the Qwen guard prompt
classifier (reference qwen3guard/llamaGuard3 role, presets.py:28-62) and
the default heuristic face detector for the blur path (RetinaFace role).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.text_encoders.qwen import QwenConfig, QwenGuardLM
from cosmos_predict2_tpu.utils.guardrails import (
    GuardrailConfig,
    GuardrailRunner,
    QwenGuardClassifier,
    create_qwen_guard_classifier,
    heuristic_face_detector,
    pixelate_region,
)

SAFE_ID, UNSAFE_ID = 7, 9


def _toy_tokenize(text: str) -> list:
    # stable byte-ish tokenizer into the tiny vocab; keep the TAIL so the
    # user prompt (which follows the guard template) stays in window
    return [ord(c) % 256 for c in text][-64:]


@pytest.fixture(scope="module")
def guard():
    cfg = QwenConfig.tiny()
    model = QwenGuardLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), dtype=jnp.int32))
    return create_qwen_guard_classifier(
        params, config=cfg, tokenize=_toy_tokenize, safe_token_id=SAFE_ID, unsafe_token_id=UNSAFE_ID
    )


@pytest.mark.level(1)
def test_guard_classifier_runs_and_is_deterministic(guard):
    v1 = guard("a scenic mountain valley at dawn")
    v2 = guard("a scenic mountain valley at dawn")
    assert isinstance(v1, bool) and v1 == v2
    # different prompts reach different logits (the LM actually runs)
    import jax.numpy as jnp

    ids_a = jnp.asarray([_toy_tokenize(guard.template.format(prompt="aaaa"))], dtype=jnp.int32)
    ids_b = jnp.asarray([_toy_tokenize(guard.template.format(prompt="zzzz"))], dtype=jnp.int32)
    la, lb = np.asarray(guard.apply_fn(ids_a)), np.asarray(guard.apply_fn(ids_b))
    assert np.abs(la - lb).max() > 0


@pytest.mark.level(1)
def test_guard_wired_into_runner(guard):
    runner = GuardrailRunner(GuardrailConfig(llm_classifier=guard))
    # blocklist still screens first regardless of the LLM verdict
    assert runner.run_text_guardrail("gore everywhere") is False
    # the LLM verdict decides for blocklist-clean prompts
    verdict = runner.run_text_guardrail("a calm lake")
    assert verdict == guard("a calm lake")


@pytest.mark.level(0)
def test_heuristic_face_detector_finds_skin_blob():
    frame = np.zeros((128, 128, 3), dtype=np.uint8)
    frame[...] = (0, 60, 0)  # green background: not skin
    # skin-tone square (face-like aspect)
    frame[32:80, 40:88] = (200, 140, 120)
    boxes = heuristic_face_detector(frame)
    assert len(boxes) == 1
    x0, y0, x1, y1 = boxes[0]
    assert x0 <= 40 and x1 >= 88 - 8 and y0 <= 32 and y1 >= 80 - 8

    # blur changes the region, leaves the rest
    blurred = pixelate_region(frame, boxes[0])
    assert blurred.shape == frame.shape
    assert np.array_equal(blurred[:8, :8], frame[:8, :8])


@pytest.mark.level(0)
def test_face_detector_clean_frame_no_boxes():
    frame = np.zeros((64, 64, 3), dtype=np.uint8)
    frame[...] = (10, 200, 30)
    assert heuristic_face_detector(frame) == []


@pytest.mark.level(1)
def test_face_blur_end_to_end_in_runner():
    cfg = GuardrailConfig(face_detector=heuristic_face_detector, blur_faces=True)
    runner = GuardrailRunner(cfg)
    frames = np.zeros((2, 128, 128, 3), dtype=np.uint8)
    frames[..., 1] = 60
    frames[:, 32:80, 40:88] = (200, 140, 120)
    out = runner.run_video_guardrail(frames)
    assert out is not None and out.shape == frames.shape
