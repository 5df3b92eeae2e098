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


# ------------------------- Qwen3Guard (generative) -------------------------


def _tiny_hf_qwen3():
    import torch
    from transformers import Qwen3Config as HFQwen3Config
    from transformers import Qwen3ForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFQwen3Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rms_norm_eps=1e-6,
        rope_theta=1e6,
        tie_word_embeddings=True,
        attention_bias=False,
    )
    return Qwen3ForCausalLM(hf_cfg).eval()


@pytest.mark.level(1)
def test_qwen3_forward_matches_hf():
    """QwenLM with the Qwen3 deltas (qk_norm, no attn bias, tied head)
    reproduces HF Qwen3ForCausalLM logits — the architecture behind the
    reference's Qwen3Guard-Gen-0.6B prompt guard (qwen3guard.py:44)."""
    import torch

    from cosmos_predict2_tpu.text_encoders.text_encoder import convert_qwen_guard_hf_state_dict

    hf = _tiny_hf_qwen3()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_qwen_guard_hf_state_dict(sd, num_layers=2)

    cfg = QwenConfig.tiny3()
    model = QwenGuardLM(cfg)
    ids = np.array([[3, 14, 159, 26, 53, 58, 97, 9]], dtype=np.int32)
    ours = np.asarray(model.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(ids)))

    with torch.no_grad():
        theirs = hf(torch.from_numpy(ids.astype(np.int64))).logits[:, -1, :].numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-3)


@pytest.mark.level(1)
def test_qwen3_greedy_generate_matches_hf():
    """Fixed-buffer greedy decode equals HF .generate(do_sample=False)."""
    import torch

    from cosmos_predict2_tpu.text_encoders.qwen import greedy_generate
    from cosmos_predict2_tpu.text_encoders.text_encoder import convert_qwen_guard_hf_state_dict

    hf = _tiny_hf_qwen3()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_qwen_guard_hf_state_dict(sd, num_layers=2))
    model = QwenGuardLM(QwenConfig.tiny3())
    apply_fn = jax.jit(lambda ids, pos: model.apply(params, ids, position=pos))

    prompt = [5, 42, 17, 101, 7]
    ours = greedy_generate(apply_fn, prompt, max_new_tokens=6, buffer_len=16)
    with torch.no_grad():
        theirs = hf.generate(
            torch.tensor([prompt]), max_new_tokens=6, do_sample=False
        )[0, len(prompt):].tolist()
    assert ours == theirs


@pytest.mark.level(0)
def test_qwen3guard_verdict_parsing():
    from cosmos_predict2_tpu.utils.guardrails import Qwen3Guard

    g = Qwen3Guard(apply_fn=None, encode=None, decode=None)
    label, cats = g.extract_label_and_categories(
        "Safety: Unsafe\nCategories: Violent, Sexual Content or Sexual Acts"
    )
    assert label == "Unsafe"
    assert cats == ["Violent", "Sexual Content or Sexual Acts"]
    label, cats = g.extract_label_and_categories("Safety: Safe\nCategories: None")
    assert label == "Safe" and cats == []
    label, _ = g.extract_label_and_categories("Safety: Controversial")
    assert label == "Controversial"


@pytest.mark.level(1)
def test_qwen3guard_is_safe_end_to_end():
    """Qwen3Guard drives greedy decode through a rigged LM whose argmax
    emits a fixed verdict string, then parses it (the reference's
    extract_label_and_categories contract, qwen3guard.py:57-77)."""
    from cosmos_predict2_tpu.utils.guardrails import Qwen3Guard

    verdict = "Safety: Unsafe\nCategories: Violent"
    vocab = sorted(set(verdict + "x"))
    eos = len(vocab)  # one extra id for EOS

    def encode(text):
        return [0] * 4  # prompt content doesn't matter for the rig

    def decode(ids):
        return "".join(vocab[i] for i in ids if i < len(vocab))

    target = [vocab.index(c) for c in verdict]

    def apply_fn(buf, pos):
        # argmax at step k (pos = 3 + k) -> target[k], then EOS
        k = int(pos) - 3
        logits = np.zeros((1, len(vocab) + 1), dtype=np.float32)
        logits[0, target[k] if k < len(target) else eos] = 1.0
        return jnp.asarray(logits)

    guard = Qwen3Guard(apply_fn, encode, decode, eos_ids=(eos,), max_new_tokens=64)
    safe, message = guard.is_safe("whatever")
    assert not safe
    assert "Unsafe" in message and "Violent" in message


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


# ---------------------- LlamaGuard3 (generative) ----------------------


@pytest.mark.level(0)
def test_llama_guard_3_block_message_parsing():
    """get_block_message mirrors the reference's category extraction
    (llamaGuard3.py:56-75): lines after the verdict split on ',', matched
    against the S1..S14 table, named with trailing '.' stripped."""
    from cosmos_predict2_tpu.utils.guardrails import LlamaGuard3

    g = LlamaGuard3(apply_fn=None, encode=None, decode=None)
    msg = g.get_block_message("unsafe\nS1,S10<|eot_id|>")
    assert msg == "Prompt blocked by Llama Guard 3. Violations: Violent Crimes, Hate."
    # unknown category tokens are skipped (warned), known ones still named
    msg = g.get_block_message("unsafe\nS99, S4")
    assert "Child Exploitation" in msg and "S99" not in msg
    # no parsable category -> generic block message
    assert g.get_block_message("unsafe") == "Prompt blocked by Llama Guard 3."


@pytest.mark.level(0)
def test_llama_guard_3_prompt_contract():
    from cosmos_predict2_tpu.utils.guardrails import LlamaGuard3

    g = LlamaGuard3(apply_fn=None, encode=None, decode=None)
    p = g.build_prompt("a cat video")
    assert "S1: Violent Crimes." in p and "s14: Code Interpreter Abuse." in p
    assert "User: a cat video" in p
    assert p.rstrip().endswith("<|start_header_id|>assistant<|end_header_id|>")


@pytest.mark.level(1)
def test_llama_guard_3_is_safe_end_to_end():
    """LlamaGuard3 drives greedy decode through a rigged LM emitting the
    released checkpoint's two-line verdict format, then filters it
    (llamaGuard3.py filter_llamaGuard3_output contract)."""
    from cosmos_predict2_tpu.utils.guardrails import LlamaGuard3

    verdict = "unsafe\nS1,S10"
    vocab = sorted(set(verdict + "x"))
    eos = len(vocab)

    def encode(text):
        return [0] * 4

    def decode(ids):
        return "".join(vocab[i] for i in ids if i < len(vocab))

    target = [vocab.index(c) for c in verdict]

    def apply_fn(buf, pos):
        k = int(pos) - 3
        logits = np.zeros((1, len(vocab) + 1), dtype=np.float32)
        logits[0, target[k] if k < len(target) else eos] = 1.0
        return jnp.asarray(logits)

    guard = LlamaGuard3(apply_fn, encode, decode, eos_ids=(eos,), max_new_tokens=32)
    safe, message = guard.is_safe("whatever")
    assert not safe
    assert "Violent Crimes" in message and "Hate" in message
    assert guard("whatever") is False


@pytest.mark.level(1)
def test_llama_guard_3_binding_on_tiny_config():
    """create_llama_guard_3 binds a real (tiny Llama-architecture) decoder:
    no attention biases, no qk-norm, untied head — one greedy verdict."""
    import dataclasses

    from cosmos_predict2_tpu.text_encoders.qwen import QwenConfig, QwenGuardLM
    from cosmos_predict2_tpu.utils.guardrails import create_llama_guard_3

    cfg = dataclasses.replace(
        QwenConfig.tiny(), attention_bias=False, qk_norm=False, tie_word_embeddings=False
    )
    # architecture deltas of the real 8B config hold on the tiny one
    full = QwenConfig.llama_guard_3_8b()
    assert (full.attention_bias, full.qk_norm, full.tie_word_embeddings) == (False, False, False)
    assert full.rope_theta == 500000.0 and full.vocab_size == 128256

    model = QwenGuardLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32), position=jnp.int32(3))

    def encode(text):
        return [1, 2, 3, 4]

    def decode(ids):
        return "safe"

    guard = create_llama_guard_3(params, encode, decode, config=cfg, eos_ids=(0,))
    safe, msg = guard.is_safe("hello")
    assert safe in (True, False)  # random weights: verdict arbitrary, path real
