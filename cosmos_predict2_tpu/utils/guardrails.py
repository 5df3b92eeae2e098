"""Guardrails: prompt and video safety filtering (host-side).

Capability parity with the reference guardrail pipeline
(cosmos_predict2/_src/imaginaire/auxiliary/guardrail/: GuardrailRunner,
blocklist + LLM prompt classifier, video content classifier + RetinaFace
face blur, presets.py:28-62). The structure is identical — a runner that
chains checks and postprocessors — with TPU-pragmatic defaults:

* text: exact/lemma-lite blocklist with word-boundary matching (the
  reference's nltk lemmatization is approximated by simple suffix
  stripping so there is no new dependency);
* an LLM classifier hook (any callable prompt -> safe bool) where
  Qwen3Guard/LlamaGuard would plug in;
* video: pluggable frame classifier + face-blur postprocessor hooks; a
  pixelation-based blur utility is provided for when a detector is wired.

All of this runs on host process 0 only, like the reference (rank-0 only).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Optional

import numpy as np

from cosmos_predict2_tpu.utils import log
from cosmos_predict2_tpu.utils.blocklist import Blocklist

# Back-compat alias: the starter list now lives in utils/blocklist.py
from cosmos_predict2_tpu.utils.blocklist import DEFAULT_BLOCKLIST as DEFAULT_BLOCKED_WORDS  # noqa: F401


@dataclasses.dataclass
class GuardrailConfig:
    # None -> the full default Blocklist (utils/blocklist.py); a tuple
    # overrides the censor word list; blocklist_dir loads the released
    # Cosmos-Guardrail1 lists (custom/ whitelist/ exact_match/ layout)
    blocked_words: Optional[tuple[str, ...]] = None
    blocklist_dir: Optional[str] = None
    llm_classifier: Optional[Callable[[str], bool]] = None  # returns is_safe
    video_classifier: Optional[Callable[[np.ndarray], bool]] = None
    face_detector: Optional[Callable[[np.ndarray], list[tuple[int, int, int, int]]]] = None
    blur_faces: bool = False


class BlocklistChecker:
    """bool-returning wrapper over the full Blocklist pipeline
    (utils/blocklist.py: leet censor + lemma pass + exact/partial match)."""

    def __init__(self, blocked_words=None, blocklist_dir=None):
        self.blocklist = Blocklist(checkpoint_dir=blocklist_dir)
        if blocked_words is not None:
            self.blocklist.blocklist_words = list(blocked_words)
            from cosmos_predict2_tpu.utils.blocklist import LeetCensor

            self.blocklist._censor = LeetCensor(blocked_words, self.blocklist.whitelist_words)

    def is_safe(self, prompt: str) -> bool:
        safe, message = self.blocklist.is_safe(prompt)
        if not safe:
            log.warning(message)
        return safe


def pixelate_region(frame: np.ndarray, box: tuple[int, int, int, int], factor: int = 16) -> np.ndarray:
    """Blur a (x0, y0, x1, y1) region by down/up sampling (face-blur filter)."""
    x0, y0, x1, y1 = box
    region = frame[y0:y1, x0:x1]
    if region.size == 0:
        return frame
    h, w = region.shape[:2]
    small = region[::factor, ::factor]
    up = np.repeat(np.repeat(small, factor, axis=0), factor, axis=1)[:h, :w]
    out = frame.copy()
    out[y0:y1, x0:x1] = up
    return out


class GuardrailRunner:
    """Chains text checks and video checks/postprocessors
    (reference presets.py create_text/video_guardrail_runner)."""

    def __init__(self, config: GuardrailConfig = GuardrailConfig()):
        self.config = config
        self.blocklist = BlocklistChecker(config.blocked_words, config.blocklist_dir)

    # ------------------------------- text -------------------------------

    def run_text_guardrail(self, prompt: str) -> bool:
        """True if the prompt is safe."""
        if not self.blocklist.is_safe(prompt):
            log.warning("prompt blocked by blocklist")
            return False
        if self.config.llm_classifier is not None and not self.config.llm_classifier(prompt):
            log.warning("prompt blocked by LLM classifier")
            return False
        return True

    # ------------------------------- video -------------------------------

    def run_video_guardrail(self, frames: np.ndarray) -> Optional[np.ndarray]:
        """frames (T, H, W, 3) float/uint8 -> filtered frames or None if unsafe."""
        if self.config.video_classifier is not None and not self.config.video_classifier(frames):
            log.warning("video blocked by content classifier")
            return None
        if self.config.blur_faces and self.config.face_detector is not None:
            out = []
            for frame in frames:
                f8 = frame if frame.dtype == np.uint8 else ((np.clip(frame, -1, 1) + 1) * 127.5).astype(np.uint8)
                for box in self.config.face_detector(f8):
                    f8 = pixelate_region(f8, box)
                out.append(f8.astype(frames.dtype) / 127.5 - 1.0 if frames.dtype != np.uint8 else f8)
            frames = np.stack(out)
        return frames


def create_text_guardrail_runner(config: GuardrailConfig = GuardrailConfig()) -> Callable[[str], bool]:
    runner = GuardrailRunner(config)
    return runner.run_text_guardrail


def create_video_guardrail_runner(config: GuardrailConfig = GuardrailConfig()):
    runner = GuardrailRunner(config)
    return runner.run_video_guardrail


# ------------------- video content safety classifier -------------------
# JAX port of the reference classifier head
# (guardrail/video_content_safety_filter/model.py:30-62: SigLIP frame
# embedding (1152-d) -> Linear/BN/ReLU x2 -> 7-class logits; a video is
# unsafe when more than CUTOFF_UNSAFE_FRAMES_PERCENT of sampled frames
# classify non-Safe, video_content_safety_filter.py:115-146).

CUTOFF_UNSAFE_FRAMES_PERCENT = 10.0


def safety_classifier_apply(params: dict, x: "np.ndarray"):
    """Inference-mode classifier head. params: {'fc1','bn1','fc2','bn2','fc3'}
    with fc={'w','b'}, bn={'scale','bias','mean','var'}; x: (N, input_size)."""
    import jax.numpy as jnp

    def bn(p, h):
        return (h - p["mean"]) / jnp.sqrt(p["var"] + 1e-5) * p["scale"] + p["bias"]

    h = x @ params["fc1"]["w"] + params["fc1"]["b"]
    h = jnp.maximum(bn(params["bn1"], h), 0.0)
    h = h @ params["fc2"]["w"] + params["fc2"]["b"]
    h = jnp.maximum(bn(params["bn2"], h), 0.0)
    return h @ params["fc3"]["w"] + params["fc3"]["b"]


def convert_safety_classifier_state_dict(sd: dict) -> dict:
    """torch VideoSafetyModel state dict -> params for
    ``safety_classifier_apply`` (layers 0/1, 3/4, 6 of the Sequential)."""

    def a(name):
        t = sd[name]
        return np.asarray(t.float().cpu().numpy() if hasattr(t, "cpu") else t, dtype=np.float32)

    def fc(i):
        return {"w": a(f"network.layers.{i}.weight").T, "b": a(f"network.layers.{i}.bias")}

    def bn(i):
        return {
            "scale": a(f"network.layers.{i}.weight"),
            "bias": a(f"network.layers.{i}.bias"),
            "mean": a(f"network.layers.{i}.running_mean"),
            "var": a(f"network.layers.{i}.running_var"),
        }

    return {"fc1": fc(0), "bn1": bn(1), "fc2": fc(3), "bn2": bn(4), "fc3": fc(6)}


class VideoContentSafetyFilter:
    """Frame-sampled video safety check. ``embed_frames`` maps uint8 frames
    (N, H, W, 3) to embeddings (N, D) — plug in a SigLIP host hook or the
    in-repo CLIP tower (text_encoders/clip_vision.py, run_head=True).

    ``normalize``: L2-normalize embeddings before the classifier — the
    reference's SigLIPEncoder does this (vision_encoder.py:42) and the
    released classifier head was trained on normalized features."""

    def __init__(self, embed_frames: Callable, classifier_params: dict,
                 sample_every: int = 8, normalize: bool = True):
        self.embed_frames = embed_frames
        self.params = classifier_params
        self.sample_every = sample_every
        self.normalize = normalize

    def is_safe_frames(self, frames_u8: np.ndarray) -> bool:
        import jax.numpy as jnp

        sampled = frames_u8[:: self.sample_every]
        emb = jnp.asarray(self.embed_frames(sampled))
        if self.normalize:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        logits = safety_classifier_apply(self.params, emb)
        classes = np.asarray(jnp.argmax(logits, axis=-1))
        unsafe = int((classes != 0).sum())  # class 0 == "Safe"
        frac = unsafe / max(1, len(classes))
        if frac > CUTOFF_UNSAFE_FRAMES_PERCENT / 100.0:
            log.warning(f"video unsafe: {unsafe}/{len(classes)} sampled frames flagged")
            return False
        return True


def create_video_content_safety_filter(classifier_ckpt: str, siglip_params=None,
                                       siglip_ckpt: str | None = None,
                                       sample_every: int = 8) -> "VideoContentSafetyFilter":
    """Build the released-weights video safety filter: SigLIP so400m/14-384
    frame embedder + 7-class MLP head (reference
    video_content_safety_filter.py:52-101, safety_filter.pt layout).

    ``classifier_ckpt``: the released ``safety_filter.pt`` (torch, with the
    state dict under "model" or flat). ``siglip_params``: converted SigLIP
    tower params; alternatively ``siglip_ckpt`` points at an HF
    SiglipVisionModel state dict to convert here.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from cosmos_predict2_tpu.text_encoders.siglip_vision import (
        SigLIPVisionConfig,
        convert_siglip_vision_state_dict,
        make_frame_embedder,
    )

    ckpt = torch.load(classifier_ckpt, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    params = convert_safety_classifier_state_dict(sd)

    if siglip_params is None:
        if siglip_ckpt is None:
            raise ValueError("need siglip_params or siglip_ckpt for the frame embedder")
        ssd = torch.load(siglip_ckpt, map_location="cpu", weights_only=True)
        siglip_params = jax.tree.map(
            jnp.asarray, convert_siglip_vision_state_dict(ssd, SigLIPVisionConfig())
        )
    embed = make_frame_embedder(siglip_params)
    return VideoContentSafetyFilter(embed, params, sample_every=sample_every)


# ----------------------- LLM prompt guard (Qwen) -----------------------
# Default model-backed prompt classifier on the in-repo Qwen decoder
# (text_encoders/qwen.py QwenGuardLM). The reference wires Qwen3Guard /
# LlamaGuard3 the same way: a guard chat template around the user prompt,
# then read off the safety verdict from the first generated token
# (imaginaire/auxiliary/guardrail/qwen3guard/, llamaGuard3/).

GUARD_TEMPLATE = (
    "<|im_start|>system\n"
    "You are a safety classifier. Classify the user prompt as safe or "
    "unsafe for a video generation model. Answer with one word: safe or "
    "unsafe.<|im_end|>\n"
    "<|im_start|>user\n{prompt}<|im_end|>\n"
    "<|im_start|>assistant\n"
)


class QwenGuardClassifier:
    """Prompt safety via next-token logit comparison on a guard LM.

    ``apply_fn(input_ids) -> (B, vocab) logits`` is a jitted QwenGuardLM
    apply; ``tokenize(text) -> list[int]``; safe/unsafe are the token ids
    of the verdict words under that tokenizer. is_safe compares their
    logits at the first generated position — the single-step equivalent of
    generating the verdict, robust and one forward pass.
    """

    def __init__(
        self,
        apply_fn: Callable,
        tokenize: Callable[[str], list],
        safe_token_id: int,
        unsafe_token_id: int,
        template: str = GUARD_TEMPLATE,
        max_len: int = 512,
    ):
        self.apply_fn = apply_fn
        self.tokenize = tokenize
        self.safe_token_id = safe_token_id
        self.unsafe_token_id = unsafe_token_id
        self.template = template
        self.max_len = max_len

    def __call__(self, prompt: str) -> bool:
        import jax.numpy as jnp

        ids = self.tokenize(self.template.format(prompt=prompt))[-self.max_len :]
        logits = np.asarray(self.apply_fn(jnp.asarray([ids], dtype=jnp.int32)))[0]
        return bool(logits[self.safe_token_id] >= logits[self.unsafe_token_id])


# --------------------------- Qwen3Guard (generative) ---------------------------
# The reference's production prompt guard (qwen3guard/qwen3guard.py:31-88):
# Qwen/Qwen3Guard-Gen-0.6B generates a verdict block, parsed with
# "Safety: (Safe|Unsafe|Controversial)" + category regexes. Here the model
# runs as the in-repo QwenLM with the Qwen3 deltas
# (QwenConfig.qwen3guard_0_6b: qk_norm, no attn bias, tied head) and greedy
# decoding (text_encoders/qwen.py greedy_generate).

# qwen3guard/categories.py
QWEN3GUARD_UNSAFE_CATEGORIES = {
    "S1": "Violent",
    "S2": "Non-violent Illegal Acts",
    "S3": "Sexual Content or Sexual Acts",
    "S4": "Suicide & Self-Harm",
    "S5": "Unethical Acts",
    "S6": "Jailbreak",
}

# Guard prompt in Qwen chat format. The released checkpoint bakes its
# classification instructions into its chat template; this reproduces that
# contract (instruction -> "Safety: <label>" [+ "Categories: ..."]) so the
# same parsing applies.
QWEN3GUARD_TEMPLATE = (
    "<|im_start|>user\n"
    "You are a safety moderator. Examine the user prompt below and "
    "classify it. Respond in exactly this format:\n"
    "Safety: Safe, Unsafe or Controversial\n"
    "Categories: comma-separated subset of [Violent, Non-violent Illegal "
    "Acts, Sexual Content or Sexual Acts, Suicide & Self-Harm, Unethical "
    "Acts, Jailbreak], or None\n"
    "<BEGIN PROMPT>\n{prompt}\n<END PROMPT><|im_end|>\n"
    "<|im_start|>assistant\n"
)


class Qwen3Guard:
    """Generative prompt guard with the reference's verdict parsing
    (qwen3guard.py extract_label_and_categories).

    ``apply_fn(ids_1xS, position) -> (1, vocab)`` is a jitted QwenGuardLM
    apply; ``encode``/``decode`` are tokenizer callables (the HF tokenizer
    of the released checkpoint); ``eos_ids`` stop greedy decoding.
    """

    def __init__(self, apply_fn, encode, decode, eos_ids=(), max_new_tokens=128):
        self.apply_fn = apply_fn
        self.encode = encode
        self.decode = decode
        self.eos_ids = tuple(eos_ids)
        self.max_new_tokens = max_new_tokens

    def extract_label_and_categories(self, content: str):
        safe_pattern = r"Safety: (Safe|Unsafe|Controversial)"
        category_pattern = r"(" + "|".join(QWEN3GUARD_UNSAFE_CATEGORIES.values()) + r")"
        label_match = re.search(safe_pattern, content)
        label = label_match.group(1) if label_match else None
        categories = re.findall(category_pattern, content)
        return label, categories

    def is_safe(self, prompt: str) -> tuple[bool, str]:
        from cosmos_predict2_tpu.text_encoders.qwen import greedy_generate

        ids = self.encode(QWEN3GUARD_TEMPLATE.format(prompt=prompt))
        out_ids = greedy_generate(
            self.apply_fn, ids, max_new_tokens=self.max_new_tokens, eos_ids=self.eos_ids
        )
        content = self.decode(out_ids)
        label, categories = self.extract_label_and_categories(content)
        if label is not None and label.lower() == "unsafe":
            return False, f"Prompt blocked by Qwen3Guard. Safety: {label}, Categories: {categories}"
        return True, ""

    def __call__(self, prompt: str) -> bool:
        safe, message = self.is_safe(prompt)
        if not safe:
            log.warning(message)
        return safe


def create_qwen3_guard(params, encode, decode, config=None, eos_ids=()):
    """Bind Qwen3Guard-Gen weights (converted via
    text_encoder.convert_qwen_guard_hf_state_dict) into a prompt guard."""
    import jax

    from cosmos_predict2_tpu.text_encoders.qwen import QwenConfig, QwenGuardLM

    config = config or QwenConfig.qwen3guard_0_6b()
    model = QwenGuardLM(config)
    apply_fn = jax.jit(lambda ids, pos: model.apply(params, ids, position=pos))
    return Qwen3Guard(apply_fn, encode, decode, eos_ids=eos_ids)


# --------------------------- LlamaGuard3 (generative) ---------------------------
# The reference's alternative prompt-guard family (guardrail/llamaGuard3/
# llamaGuard3.py:29-111): meta-llama/Llama-Guard-3-8B generates a verdict
# ("safe" | "unsafe\n<categories>"), parsed against the S1..S14 category
# table (llamaGuard3/categories.py). The model runs as the in-repo QwenLM
# decoder with the Llama-3.1 deltas (QwenConfig.llama_guard_3_8b) and
# greedy decoding; HF weights convert via the same auto-detecting
# convert_qwen_guard_hf_state_dict (identical module naming).

# llamaGuard3/categories.py (MLCommons hazard taxonomy; "s14" lowercase
# matches the reference table verbatim — its parser compares raw strings)
LLAMA_GUARD_3_UNSAFE_CATEGORIES = {
    "S1": "Violent Crimes.",
    "S2": "Non-Violent Crimes.",
    "S3": "Sex Crimes.",
    "S4": "Child Exploitation.",
    "S5": "Defamation.",
    "S6": "Specialized Advice.",
    "S7": "Privacy.",
    "S8": "Intellectual Property.",
    "S9": "Indiscriminate Weapons.",
    "S10": "Hate.",
    "S11": "Self-Harm.",
    "S12": "Sexual Content.",
    "S13": "Elections.",
    "s14": "Code Interpreter Abuse.",
}

# The released checkpoint's chat template (Llama Guard 3 model card): a
# moderation task header, the category table, the conversation, and the
# two-line answer contract.
LLAMA_GUARD_3_TEMPLATE = (
    "<|begin_of_text|><|start_header_id|>user<|end_header_id|>\n\n"
    "Task: Check if there is unsafe content in 'User' messages in "
    "conversations according our safety policy with the below categories.\n\n"
    "<BEGIN UNSAFE CONTENT CATEGORIES>\n{categories}<END UNSAFE CONTENT CATEGORIES>\n\n"
    "<BEGIN CONVERSATION>\n\nUser: {prompt}\n\n<END CONVERSATION>\n\n"
    "Provide your safety assessment for ONLY THE LAST User message in the "
    "above conversation:\n"
    " - First line must read 'safe' or 'unsafe'.\n"
    " - If unsafe, a second line must include a comma-separated list of "
    "violated categories.<|eot_id|>"
    "<|start_header_id|>assistant<|end_header_id|>\n\n"
)


class LlamaGuard3:
    """Generative prompt guard with the reference's output filtering
    (llamaGuard3.py filter_llamaGuard3_output / get_llamaGuard3_block_message).

    Same binding contract as :class:`Qwen3Guard`: ``apply_fn(ids_1xS,
    position) -> (1, vocab)`` jitted decoder step, ``encode``/``decode``
    tokenizer callables, ``eos_ids`` greedy stop set.
    """

    def __init__(self, apply_fn, encode, decode, eos_ids=(), max_new_tokens=100):
        self.apply_fn = apply_fn
        self.encode = encode
        self.decode = decode
        self.eos_ids = tuple(eos_ids)
        self.max_new_tokens = max_new_tokens

    def build_prompt(self, prompt: str) -> str:
        cats = "".join(f"{k}: {v}\n" for k, v in LLAMA_GUARD_3_UNSAFE_CATEGORIES.items())
        return LLAMA_GUARD_3_TEMPLATE.format(categories=cats, prompt=prompt)

    def get_block_message(self, moderation_output: str) -> str:
        """Extract violated categories (llamaGuard3.py:56-75): every line
        after the first is split on ',' and matched against the table;
        unknown tokens are warned about, recognized ones named in the
        block message (trailing '.' stripped, as there)."""
        block_msg = "Prompt blocked by Llama Guard 3."
        try:
            detected = []
            for line in moderation_output.splitlines()[1:]:
                for cat in line.split("<|eot_id|>")[0].strip().split(","):
                    cat = cat.strip()
                    if not cat:
                        continue
                    if cat not in LLAMA_GUARD_3_UNSAFE_CATEGORIES:
                        log.warning(f"Unrecognized category from moderation output: {cat}")
                    else:
                        detected.append(cat)
            if detected:
                names = ", ".join(LLAMA_GUARD_3_UNSAFE_CATEGORIES[c][:-1] for c in detected)
                block_msg = f"{block_msg} Violations: {names}."
        except Exception as e:  # noqa: BLE001
            log.warning(f"Unable to extract blocked category from Llama Guard 3 output: {e}")
        return block_msg

    def is_safe(self, prompt: str) -> tuple[bool, str]:
        from cosmos_predict2_tpu.text_encoders.qwen import greedy_generate

        ids = self.encode(self.build_prompt(prompt))
        out_ids = greedy_generate(
            self.apply_fn, ids, max_new_tokens=self.max_new_tokens, eos_ids=self.eos_ids
        )
        moderation_output = self.decode(out_ids).strip()
        if "unsafe" in moderation_output.lower():
            return False, self.get_block_message(moderation_output)
        return True, ""

    def __call__(self, prompt: str) -> bool:
        safe, message = self.is_safe(prompt)
        if not safe:
            log.warning(message)
        return safe


def create_llama_guard_3(params, encode, decode, config=None, eos_ids=()):
    """Bind Llama-Guard-3-8B weights (converted via
    text_encoder.convert_qwen_guard_hf_state_dict — Llama-3.1 uses the
    same HF module naming) into a prompt guard."""
    import jax

    from cosmos_predict2_tpu.text_encoders.qwen import QwenConfig, QwenGuardLM

    config = config or QwenConfig.llama_guard_3_8b()
    model = QwenGuardLM(config)
    apply_fn = jax.jit(lambda ids, pos: model.apply(params, ids, position=pos))
    return LlamaGuard3(apply_fn, encode, decode, eos_ids=eos_ids)


def create_qwen_guard_classifier(params, config=None, tokenize=None,
                                 safe_token_id=None, unsafe_token_id=None):
    """Bind a QwenGuardLM params tree into a prompt classifier callable."""
    import jax

    from cosmos_predict2_tpu.text_encoders.qwen import QwenConfig, QwenGuardLM

    config = config or QwenConfig.qwen2_5_vl_7b()
    model = QwenGuardLM(config)
    apply_fn = jax.jit(lambda ids: model.apply(params, ids))
    return QwenGuardClassifier(apply_fn, tokenize, safe_token_id, unsafe_token_id)


# ----------------------- default face detector -----------------------
# Host-side heuristic detector for the face-blur path: YCbCr skin
# segmentation + connected components + box shape filtering. Weak compared
# to the reference's RetinaFace (guardrail/face_blur_filter/) but a real
# working default with zero model weights; RetinaFace-style detectors plug
# into GuardrailConfig.face_detector unchanged.


def _connected_components(mask: np.ndarray) -> np.ndarray:
    """Two-pass union-find labeling of a boolean mask (4-connectivity)."""
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent = [0]

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    nxt = 1
    for y in range(h):
        for x in range(w):
            if not mask[y, x]:
                continue
            up = labels[y - 1, x] if y else 0
            left = labels[y, x - 1] if x else 0
            if not up and not left:
                parent.append(nxt)
                labels[y, x] = nxt
                nxt += 1
            elif up and left and up != left:
                ra, rb = find(up), find(left)
                parent[max(ra, rb)] = min(ra, rb)
                labels[y, x] = min(ra, rb)
            else:
                labels[y, x] = up or left
    for y in range(h):
        for x in range(w):
            if labels[y, x]:
                labels[y, x] = find(labels[y, x])
    return labels


def create_face_detector(checkpoint_path: Optional[str] = None):
    """Face detector for the blur guardrail, model-backed when possible.

    With a checkpoint (the public RetinaFace ``Resnet50_Final.pth``, the
    same model the reference runs — face_blur_filter.py:53-80), returns a
    :class:`~cosmos_predict2_tpu.utils.retinaface.RetinaFaceDetector`
    through ``convert_retinaface_state_dict``. Without one, falls back to
    the dependency-free skin-tone heuristic below.
    """
    if checkpoint_path:
        import jax
        import jax.numpy as jnp
        import torch

        from cosmos_predict2_tpu.utils.retinaface import (
            RetinaFaceDetector,
            convert_retinaface_state_dict,
        )

        sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
        sd = {k.removeprefix("module."): v.numpy() for k, v in sd.items()}
        params = convert_retinaface_state_dict(sd)
        return RetinaFaceDetector(jax.tree.map(jnp.asarray, params))
    return heuristic_face_detector


def heuristic_face_detector(frame_u8: np.ndarray, downsample: int = 8,
                            min_area_frac: float = 0.002) -> list:
    """(H, W, 3) uint8 -> [(x0, y0, x1, y1)] candidate face boxes."""
    f = frame_u8[::downsample, ::downsample].astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
    skin = (cb > 77) & (cb < 127) & (cr > 133) & (cr < 173)
    labels = _connected_components(skin)
    boxes = []
    hs, ws = frame_u8.shape[:2]
    for lab in np.unique(labels):
        if lab == 0:
            continue
        ys, xs = np.nonzero(labels == lab)
        if len(ys) < min_area_frac * skin.size:
            continue
        x0, x1 = xs.min() * downsample, (xs.max() + 1) * downsample
        y0, y1 = ys.min() * downsample, (ys.max() + 1) * downsample
        bw, bh = x1 - x0, y1 - y0
        if 0.4 <= bw / max(bh, 1) <= 2.5:  # face-ish aspect
            boxes.append((int(x0), int(y0), int(min(x1, ws)), int(min(y1, hs))))
    return boxes
