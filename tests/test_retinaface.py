"""RetinaFace detector: converter + forward parity and box-math parity.

The real oracle checkpoint (Resnet50_Final.pth) needs network egress, and
the `retinaface` pip package is not installed here — so the forward test
carries a faithful torch replica of the public biubug6/Pytorch_Retinaface
architecture with the EXACT state-dict key layout of the released
checkpoint (body.* torchvision resnet50, fpn.output*/merge*, ssh*.conv*,
ClassHead/BboxHead/LandmarkHead ModuleLists). The box decode/filter math
is additionally pinned against the reference repo's own
retinaface_utils.py (decode_batch / filter_detected_boxes) imported
through the shims.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax
import jax.numpy as jnp


# ------------------------- torch replica (oracle) -------------------------


def conv_bn(inp, oup, stride=1):
    return nn.Sequential(nn.Conv2d(inp, oup, 3, stride, 1, bias=False), nn.BatchNorm2d(oup), nn.ReLU(inplace=True))


def conv_bn_no_relu(inp, oup, stride=1):
    return nn.Sequential(nn.Conv2d(inp, oup, 3, stride, 1, bias=False), nn.BatchNorm2d(oup))


def conv_bn1x1(inp, oup):
    return nn.Sequential(nn.Conv2d(inp, oup, 1, 1, 0, bias=False), nn.BatchNorm2d(oup), nn.ReLU(inplace=True))


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inp, width, stride=1):
        super().__init__()
        out = width * 4
        self.conv1 = nn.Conv2d(inp, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = nn.Sequential(nn.Conv2d(inp, out, 1, stride, bias=False), nn.BatchNorm2d(out))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.relu(h + idn)


class ResNet50Body(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def layer(inp, width, blocks, stride):
            mods = [Bottleneck(inp, width, stride)]
            for _ in range(blocks - 1):
                mods.append(Bottleneck(width * 4, width))
            return nn.Sequential(*mods)

        self.layer1 = layer(64, 64, 3, 1)
        self.layer2 = layer(256, 128, 4, 2)
        self.layer3 = layer(512, 256, 6, 2)
        self.layer4 = layer(1024, 512, 3, 2)

    def forward(self, x):
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        h = self.layer1(h)
        c3 = self.layer2(h)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


class FPN(nn.Module):
    def __init__(self, ins=(512, 1024, 2048), out=256):
        super().__init__()
        self.output1 = conv_bn1x1(ins[0], out)
        self.output2 = conv_bn1x1(ins[1], out)
        self.output3 = conv_bn1x1(ins[2], out)
        self.merge1 = conv_bn(out, out)
        self.merge2 = conv_bn(out, out)

    def forward(self, c3, c4, c5):
        o1, o2, o3 = self.output1(c3), self.output2(c4), self.output3(c5)
        o2 = o2 + nn.functional.interpolate(o3, size=o2.shape[2:], mode="nearest")
        o2 = self.merge2(o2)
        o1 = o1 + nn.functional.interpolate(o2, size=o1.shape[2:], mode="nearest")
        o1 = self.merge1(o1)
        return o1, o2, o3


class SSH(nn.Module):
    def __init__(self, inp=256, out=256):
        super().__init__()
        self.conv3X3 = conv_bn_no_relu(inp, out // 2)
        self.conv5X5_1 = conv_bn(inp, out // 4)
        self.conv5X5_2 = conv_bn_no_relu(out // 4, out // 4)
        self.conv7X7_2 = conv_bn(out // 4, out // 4)
        self.conv7x7_3 = conv_bn_no_relu(out // 4, out // 4)

    def forward(self, x):
        c3 = self.conv3X3(x)
        c51 = self.conv5X5_1(x)
        c5 = self.conv5X5_2(c51)
        c7 = self.conv7x7_3(self.conv7X7_2(c51))
        return nn.functional.relu(torch.cat([c3, c5, c7], dim=1))


class Head(nn.Module):
    def __init__(self, inp, out_per_anchor, anchors=2):
        super().__init__()
        self.out = out_per_anchor
        self.conv1x1 = nn.Conv2d(inp, anchors * out_per_anchor, 1)

    def forward(self, x):
        h = self.conv1x1(x).permute(0, 2, 3, 1).contiguous()
        return h.view(h.shape[0], -1, self.out)


class RetinaFaceOracle(nn.Module):
    def __init__(self):
        super().__init__()
        self.body = ResNet50Body()
        self.fpn = FPN()
        self.ssh1, self.ssh2, self.ssh3 = SSH(), SSH(), SSH()
        self.ClassHead = nn.ModuleList([Head(256, 2) for _ in range(3)])
        self.BboxHead = nn.ModuleList([Head(256, 4) for _ in range(3)])
        self.LandmarkHead = nn.ModuleList([Head(256, 10) for _ in range(3)])

    def forward(self, x):
        feats = self.fpn(*self.body(x))
        feats = [ssh(f) for ssh, f in zip((self.ssh1, self.ssh2, self.ssh3), feats)]
        loc = torch.cat([self.BboxHead[i](f) for i, f in enumerate(feats)], dim=1)
        conf = torch.softmax(torch.cat([self.ClassHead[i](f) for i, f in enumerate(feats)], dim=1), dim=-1)
        ldm = torch.cat([self.LandmarkHead[i](f) for i, f in enumerate(feats)], dim=1)
        return loc, conf, ldm


def _randomize_bn(model: nn.Module, rng: np.random.RandomState):
    """Non-trivial running stats so BN folding is actually exercised."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.from_numpy(rng.randn(n).astype(np.float32) * 0.2))
            m.running_var.copy_(torch.from_numpy((rng.rand(n).astype(np.float32) * 0.5 + 0.5)))
            m.weight.data.copy_(torch.from_numpy(rng.rand(n).astype(np.float32) + 0.5))
            m.bias.data.copy_(torch.from_numpy(rng.randn(n).astype(np.float32) * 0.1))


@pytest.fixture(scope="module")
def oracle_pair():
    from cosmos_predict2_tpu.utils.retinaface import convert_retinaface_state_dict

    torch.manual_seed(0)
    oracle = RetinaFaceOracle().eval()
    rng = np.random.RandomState(2)
    with torch.no_grad():
        _randomize_bn(oracle, rng)
    params = convert_retinaface_state_dict({k: v.numpy() for k, v in oracle.state_dict().items()})
    params = jax.tree.map(lambda a: jnp.asarray(a), params)
    return oracle, params


@pytest.mark.level(1)
def test_retinaface_forward_matches_oracle(oracle_pair):
    from cosmos_predict2_tpu.utils.retinaface import retinaface_forward

    oracle, params = oracle_pair
    rng = np.random.RandomState(0)
    x = (rng.rand(1, 3, 64, 96).astype(np.float32) * 255.0) - 117.0
    with torch.no_grad():
        ref_loc, ref_conf, ref_ldm = (t.numpy() for t in oracle(torch.from_numpy(x)))

    loc, conf, ldm = retinaface_forward(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    for mine, ref, name in ((loc, ref_loc, "loc"), (conf, ref_conf, "conf"), (ldm, ref_ldm, "ldm")):
        mine = np.asarray(mine)
        assert mine.shape == ref.shape, (name, mine.shape, ref.shape)
        scale = max(np.abs(ref).max(), 1e-3)
        assert np.abs(mine - ref).max() < 5e-4 * scale, (name, np.abs(mine - ref).max(), scale)


@pytest.mark.level(1)
def test_box_math_matches_reference():
    """prior decode + confidence/NMS filtering vs the reference's own
    retinaface_utils.py (decode_batch :47-117, filter_detected_boxes
    :24-45), with the public py_cpu_nms shimmed to the same numpy NMS."""
    import sys
    import types

    from reference_shims import install_shims, _mod

    install_shims()
    from cosmos_predict2_tpu.utils import retinaface as rf

    def py_cpu_nms(dets, thresh):
        return rf.nms(dets, thresh)

    nms_mod = _mod("retinaface.utils.nms.py_cpu_nms", py_cpu_nms=py_cpu_nms)
    nms_pkg = _mod("retinaface.utils.nms", py_cpu_nms=nms_mod)
    utils_pkg = _mod("retinaface.utils", nms=nms_pkg)
    _mod("retinaface", utils=utils_pkg)

    import importlib

    ru = importlib.import_module(
        "cosmos_predict2._src.imaginaire.auxiliary.guardrail.face_blur_filter.retinaface_utils"
    )

    rng = np.random.RandomState(3)
    priors = rf.prior_boxes(64, 96)
    loc = rng.randn(2, priors.shape[0], 4).astype(np.float32) * 0.5

    ref_boxes = ru.decode_batch(torch.from_numpy(loc), torch.from_numpy(priors), list(rf.VARIANCE)).numpy()
    mine0 = rf.decode_boxes(loc[0], priors)
    mine1 = rf.decode_boxes(loc[1], priors)
    np.testing.assert_allclose(np.stack([mine0, mine1]), ref_boxes, rtol=1e-5, atol=1e-5)

    scores = rng.rand(priors.shape[0]).astype(np.float32)
    scale = np.asarray([96, 64, 96, 64], np.float32)
    ref_kept = ru.filter_detected_boxes(
        mine0 * scale, scores, confidence_threshold=0.5, nms_threshold=0.4, top_k=5000, keep_top_k=750
    )
    my_kept = rf.filter_boxes(mine0 * scale, scores, 0.5, 0.4, 5000, 750)
    np.testing.assert_allclose(my_kept, ref_kept, rtol=1e-6, atol=1e-6)


@pytest.mark.level(1)
def test_detector_end_to_end_and_fallback(oracle_pair):
    """RetinaFaceDetector runs on a real frame shape and returns clipped
    int boxes; create_face_detector without a checkpoint falls back to the
    heuristic."""
    from cosmos_predict2_tpu.utils.guardrails import create_face_detector, heuristic_face_detector
    from cosmos_predict2_tpu.utils.retinaface import RetinaFaceDetector

    _, params = oracle_pair
    det = RetinaFaceDetector(params, confidence_threshold=0.05)
    frame = (np.random.RandomState(0).rand(64, 96, 3) * 255).astype(np.uint8)
    boxes = det(frame)
    for x0, y0, x1, y1 in boxes:
        assert 0 <= x0 <= x1 <= 96 and 0 <= y0 <= y1 <= 64

    assert create_face_detector(None) is heuristic_face_detector
