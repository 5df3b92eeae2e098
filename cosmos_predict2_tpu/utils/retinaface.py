"""RetinaFace-ResNet50 face detector for the face-blur guardrail.

Model-backed replacement for the skin-tone heuristic (VERDICT r2 #8): the
reference runs RetinaFace with the `Resnet50_Final.pth` checkpoint
(imaginaire/auxiliary/guardrail/face_blur_filter/face_blur_filter.py:53-80,
model constants :46-49), using the public biubug6/Pytorch_Retinaface
architecture (cfg_re50: min_sizes [[16,32],[64,128],[256,512]], steps
[8,16,32], variance [0.1,0.2], FPN/SSH out_channel 256).

TPU-first shape: pure functions over a converted param tree (NHWC convs,
BatchNorm folded into per-channel scale/bias at conversion — inference
only), jitted once per image size; prior-box generation, box decoding,
confidence filtering and NMS run on the host in numpy exactly as the
reference's retinaface_utils.py:24-117 does.

Weight import: ``convert_retinaface_state_dict`` consumes the public
checkpoint's key layout (body.* torchvision resnet50, fpn.output*/merge*,
ssh1-3.conv*, ClassHead/BboxHead/LandmarkHead ModuleLists).
"""

from __future__ import annotations

import math
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

MIN_SIZES = ((16, 32), (64, 128), (256, 512))
STEPS = (8, 16, 32)
VARIANCE = (0.1, 0.2)
NUM_ANCHORS = 2
# BGR channel means, matching the reference preprocess (detect.py upstream)
BGR_MEAN = (104.0, 117.0, 123.0)


# ------------------------------- primitives -------------------------------


def _conv(p, x, stride=1, pad=0, relu=False):
    """Conv (HWIO weights) + folded-BN affine (+ optional ReLU)."""
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out * p["scale"] + p["bias"]
    return jax.nn.relu(out) if relu else out


def _maxpool_3x3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )


def _bottleneck(p, x, stride):
    h = _conv(p["conv1"], x, 1, 0, relu=True)
    h = _conv(p["conv2"], h, stride, 1, relu=True)
    h = _conv(p["conv3"], h, 1, 0)
    sc = _conv(p["downsample"], x, stride, 0) if "downsample" in p else x
    return jax.nn.relu(h + sc)


def _resnet50_c345(p, x):
    """Stem + layer1..4; returns (C3, C4, C5) = layer2/3/4 outputs."""
    h = _conv(p["stem"], x, 2, 3, relu=True)  # 7x7/2
    h = _maxpool_3x3s2(h)
    outs = []
    for li, (n_blocks, stride) in enumerate(((3, 1), (4, 2), (6, 2), (3, 2)), start=1):
        for bi in range(n_blocks):
            h = _bottleneck(p[f"layer{li}"][f"b{bi}"], h, stride if bi == 0 else 1)
        if li >= 2:
            outs.append(h)
    return tuple(outs)


def _nearest_to(x, h, w):
    B, H, W, C = x.shape
    rows = (jnp.arange(h) * H) // h
    cols = (jnp.arange(w) * W) // w
    return x[:, rows][:, :, cols]


def _fpn(p, c3, c4, c5):
    o1 = _conv(p["output1"], c3, 1, 0, relu=True)
    o2 = _conv(p["output2"], c4, 1, 0, relu=True)
    o3 = _conv(p["output3"], c5, 1, 0, relu=True)
    o2 = o2 + _nearest_to(o3, o2.shape[1], o2.shape[2])
    o2 = _conv(p["merge2"], o2, 1, 1, relu=True)
    o1 = o1 + _nearest_to(o2, o1.shape[1], o1.shape[2])
    o1 = _conv(p["merge1"], o1, 1, 1, relu=True)
    return o1, o2, o3


def _ssh(p, x):
    c3 = _conv(p["conv3X3"], x, 1, 1)
    c51 = _conv(p["conv5X5_1"], x, 1, 1, relu=True)
    c5 = _conv(p["conv5X5_2"], c51, 1, 1)
    c72 = _conv(p["conv7X7_2"], c51, 1, 1, relu=True)
    c7 = _conv(p["conv7x7_3"], c72, 1, 1)
    return jax.nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


def retinaface_forward(params: Mapping, x_bhwc: jax.Array):
    """x: (B, H, W, 3) float32, BGR mean-subtracted.

    Returns (loc (B,P,4), conf softmax (B,P,2), landm (B,P,10)) with P =
    total priors over the three FPN levels.
    """
    c3, c4, c5 = _resnet50_c345(params["body"], x_bhwc)
    feats = _fpn(params["fpn"], c3, c4, c5)
    feats = tuple(_ssh(params[f"ssh{i + 1}"], f) for i, f in enumerate(feats))

    locs, confs, ldms = [], [], []
    B = x_bhwc.shape[0]
    for i, f in enumerate(feats):
        # heads are 1x1 convs; torch permutes NCHW->NHWC then flattens, so
        # the NHWC layout here flattens identically
        locs.append(_conv(params["BboxHead"][i], f, 1, 0).reshape(B, -1, 4))
        confs.append(_conv(params["ClassHead"][i], f, 1, 0).reshape(B, -1, 2))
        ldms.append(_conv(params["LandmarkHead"][i], f, 1, 0).reshape(B, -1, 10))
    loc = jnp.concatenate(locs, axis=1)
    conf = jax.nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
    ldm = jnp.concatenate(ldms, axis=1)
    return loc, conf, ldm


# ------------------------------ host-side box math ------------------------------


def prior_boxes(image_h: int, image_w: int) -> np.ndarray:
    """Anchor priors in center-offset form (P, 4), normalized; clip=False."""
    anchors = []
    for k, step in enumerate(STEPS):
        fh, fw = math.ceil(image_h / step), math.ceil(image_w / step)
        for i in range(fh):
            for j in range(fw):
                for m in MIN_SIZES[k]:
                    s_kx, s_ky = m / image_w, m / image_h
                    cx = (j + 0.5) * step / image_w
                    cy = (i + 0.5) * step / image_h
                    anchors.append((cx, cy, s_kx, s_ky))
    return np.asarray(anchors, dtype=np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """Reference decode (retinaface_utils.py:47-117) on (P, 4) arrays."""
    centers = priors[:, :2] + loc[:, :2] * VARIANCE[0] * priors[:, 2:]
    sizes = priors[:, 2:] * np.exp(loc[:, 2:] * VARIANCE[1])
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=1)
    return boxes


def nms(dets: np.ndarray, threshold: float) -> list[int]:
    """Plain numpy NMS (reference py_cpu_nms)."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = int(order[0])
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= threshold]
    return keep


def filter_boxes(
    boxes: np.ndarray,
    scores: np.ndarray,
    confidence_threshold: float = 0.7,
    nms_threshold: float = 0.4,
    top_k: int = 5000,
    keep_top_k: int = 750,
) -> np.ndarray:
    """Reference filter_detected_boxes (retinaface_utils.py:24-45)."""
    inds = np.where(scores > confidence_threshold)[0]
    boxes, scores = boxes[inds], scores[inds]
    order = scores.argsort()[::-1][:top_k]
    boxes, scores = boxes[order], scores[order]
    dets = np.hstack((boxes, scores[:, None])).astype(np.float32, copy=False)
    keep = nms(dets, nms_threshold)
    return dets[keep, :][:keep_top_k, :4]


class RetinaFaceDetector:
    """Callable (H, W, 3) uint8 RGB frame -> [(x0, y0, x1, y1), ...]."""

    def __init__(self, params, confidence_threshold: float = 0.7, nms_threshold: float = 0.4):
        self.params = params
        self.confidence_threshold = confidence_threshold
        self.nms_threshold = nms_threshold
        self._fwd = jax.jit(retinaface_forward)
        self._priors: dict[tuple[int, int], np.ndarray] = {}

    def __call__(self, frame_u8: np.ndarray) -> list:
        h, w = frame_u8.shape[:2]
        bgr = frame_u8[..., ::-1].astype(np.float32) - np.asarray(BGR_MEAN, np.float32)
        loc, conf, _ = self._fwd(self.params, jnp.asarray(bgr)[None])
        if (h, w) not in self._priors:
            self._priors[(h, w)] = prior_boxes(h, w)
        boxes = decode_boxes(np.asarray(loc[0]), self._priors[(h, w)])
        boxes = boxes * np.asarray([w, h, w, h], np.float32)
        kept = filter_boxes(
            boxes, np.asarray(conf[0, :, 1]), self.confidence_threshold, self.nms_threshold
        )
        out = []
        for x0, y0, x1, y1 in kept:
            out.append((int(max(0, x0)), int(max(0, y0)), int(min(w, x1)), int(min(h, y1))))
        return out


# ------------------------------- weight import -------------------------------


def _fold_bn(w_oihw: np.ndarray, bn_w, bn_b, bn_mean, bn_var, eps: float = 1e-5) -> dict:
    """Conv OIHW + BatchNorm running stats -> HWIO conv + scale/bias."""
    scale = np.asarray(bn_w) / np.sqrt(np.asarray(bn_var) + eps)
    bias = np.asarray(bn_b) - np.asarray(bn_mean) * scale
    return {
        "w": np.transpose(np.asarray(w_oihw), (2, 3, 1, 0)).astype(np.float32),
        "scale": scale.astype(np.float32),
        "bias": bias.astype(np.float32),
    }


def _conv_only(w_oihw: np.ndarray, b) -> dict:
    return {
        "w": np.transpose(np.asarray(w_oihw), (2, 3, 1, 0)).astype(np.float32),
        "scale": np.ones((w_oihw.shape[0],), np.float32),
        "bias": np.asarray(b, np.float32),
    }


def convert_retinaface_state_dict(sd: Mapping) -> dict:
    """Public Resnet50_Final.pth layout -> the param tree used above."""

    def bn_fold(conv_key: str, bn_key: str) -> dict:
        return _fold_bn(
            sd[f"{conv_key}.weight"],
            sd[f"{bn_key}.weight"], sd[f"{bn_key}.bias"],
            sd[f"{bn_key}.running_mean"], sd[f"{bn_key}.running_var"],
        )

    body: dict = {"stem": bn_fold("body.conv1", "body.bn1")}
    for li, n_blocks in zip(range(1, 5), (3, 4, 6, 3)):
        layer: dict = {}
        for bi in range(n_blocks):
            pre = f"body.layer{li}.{bi}"
            blk = {
                "conv1": bn_fold(f"{pre}.conv1", f"{pre}.bn1"),
                "conv2": bn_fold(f"{pre}.conv2", f"{pre}.bn2"),
                "conv3": bn_fold(f"{pre}.conv3", f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = bn_fold(f"{pre}.downsample.0", f"{pre}.downsample.1")
            layer[f"b{bi}"] = blk
        body[f"layer{li}"] = layer

    # fpn/ssh convs are nn.Sequential(conv, bn[, leaky]) -> keys .0 / .1
    def seq(prefix: str) -> dict:
        return bn_fold(f"{prefix}.0", f"{prefix}.1")

    fpn = {name: seq(f"fpn.{name}") for name in ("output1", "output2", "output3", "merge1", "merge2")}
    sshs = {
        f"ssh{i}": {
            name: seq(f"ssh{i}.{name}")
            for name in ("conv3X3", "conv5X5_1", "conv5X5_2", "conv7X7_2", "conv7x7_3")
        }
        for i in (1, 2, 3)
    }
    heads = {
        head: [
            _conv_only(sd[f"{head}.{i}.conv1x1.weight"], sd[f"{head}.{i}.conv1x1.bias"])
            for i in range(3)
        ]
        for head in ("ClassHead", "BboxHead", "LandmarkHead")
    }
    return {"body": body, "fpn": fpn, **sshs, **heads}
