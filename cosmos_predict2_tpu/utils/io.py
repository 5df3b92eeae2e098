"""Media IO: image/video read, resize, and mp4/png export.

Replaces the slice of the reference's easy_io + visualize stack the
inference path needs (imaginaire/utils/easy_io/, visualize/video.py:
``save_img_or_video``): local-path imageio/PIL IO, host-side only — device
code never touches files.
"""

from __future__ import annotations

import os

import numpy as np


def read_image(path: str) -> np.ndarray:
    """Read an image -> uint8 (H, W, 3)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def read_video(path: str, max_frames: int | None = None) -> tuple[np.ndarray, float]:
    """Read a video -> (uint8 (T, H, W, 3), fps).

    Supports mp4/webm/mkv (when an imageio video backend is present), gif,
    .npy/.npz frame stacks, and directories of numbered pngs — so the
    pipeline works in codec-less environments too.
    """
    if os.path.isdir(path):
        from PIL import Image

        files = sorted(os.listdir(path))
        frames = np.stack([np.asarray(Image.open(os.path.join(path, f)).convert("RGB")) for f in files])
        return frames[:max_frames].astype(np.uint8), 16.0
    if path.endswith(".npy"):
        return np.load(path)[:max_frames].astype(np.uint8), 16.0
    if path.endswith(".npz"):
        data = np.load(path)
        return data["video"][:max_frames].astype(np.uint8), float(data.get("fps", 16.0))
    if path.endswith(".gif"):
        from PIL import Image, ImageSequence

        img = Image.open(path)
        frames = np.stack([np.asarray(f.convert("RGB")) for f in ImageSequence.Iterator(img)])
        return frames[:max_frames].astype(np.uint8), 1000.0 / img.info.get("duration", 62.5)

    import imageio.v3 as iio

    frames = iio.imread(path)
    meta = {}
    try:
        meta = iio.immeta(path)
    except Exception:
        pass
    fps = float(meta.get("fps", 16.0))
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[None]
    if max_frames is not None:
        frames = frames[:max_frames]
    return frames.astype(np.uint8), fps


def resize_frames(frames: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bilinear resize uint8 (T, H, W, 3) -> (T, height, width, 3).

    Matches the reference's resize_input (predict2/inference/video2world.py:75).
    Uses the native C++ kernel (csrc/media_ops.cpp, ~2x PIL on this host)
    with a NumPy fallback.
    """
    from cosmos_predict2_tpu.utils import native

    return native.resize_bilinear(frames, height, width)


def save_img_or_video(
    frames_f32: np.ndarray, path: str, fps: int = 16, input_range: str = "[-1,1]"
) -> str:
    """Save frames: (T, H, W, 3) -> mp4 (or png if T==1).

    ``input_range`` is explicit ("[-1,1]" — what every pipeline path
    produces — or "[0,1]") rather than inferred from the data: an all-bright
    [-1,1] clip whose min is >= 0 would otherwise skip the rescale and save
    washed out (ADVICE r1). uint8 frames are written as-is (the streaming
    VAE's ``pixel_format="uint8"`` route quantizes on device; re-scaling
    here would double-convert).

    Parity: imaginaire/visualize/video.py (fps=16 default at save,
    cosmos_predict2/inference.py:171).
    """
    frames = np.asarray(frames_f32)
    if frames.dtype != np.uint8:
        if input_range == "[-1,1]":
            frames = (frames + 1.0) / 2.0
        elif input_range != "[0,1]":
            raise ValueError(f"input_range must be '[-1,1]' or '[0,1]', got {input_range!r}")
        frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    if frames.shape[0] == 1 or path.endswith(".png") or path.endswith(".jpg"):
        from PIL import Image

        if not path.endswith((".png", ".jpg")):
            path = path + ".png"
        Image.fromarray(frames[0]).save(path)
        return path
    if not path.endswith((".mp4", ".gif")):
        path = path + ".mp4"
    if path.endswith(".mp4"):
        try:
            import imageio.v3 as iio

            iio.imwrite(path, frames, fps=fps)
            return path
        except Exception:
            # no video codec in this environment: fall back to GIF
            path = path[:-4] + ".gif"
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:], duration=int(1000 / fps), loop=0)
    return path


# Resolution buckets (reference predict2/datasets/utils.py:44-59).
VIDEO_RES_SIZE_INFO: dict[str, dict[str, tuple[int, int]]] = {
    "480": {"16,9": (832, 480), "9,16": (480, 832), "1,1": (640, 640), "4,3": (768, 576), "3,4": (576, 768)},
    "720": {"16,9": (1280, 704), "9,16": (704, 1280), "1,1": (960, 960), "4,3": (1088, 832), "3,4": (832, 1088)},
    "720p": {"16,9": (1280, 720), "9,16": (720, 1280), "1,1": (960, 960), "4,3": (1088, 832), "3,4": (832, 1088)},
}


def get_resolution(resolution: str, aspect: str = "16,9") -> tuple[int, int]:
    """Returns (width, height) for a resolution bucket."""
    return VIDEO_RES_SIZE_INFO[resolution][aspect]


# Image-mode buckets (reference predict2/datasets/utils.py:19-42
# IMAGE_RES_SIZE_INFO; dims stay multiples of 16 for the VAE/patch grid).
IMAGE_RES_SIZE_INFO: dict[str, dict[str, tuple[int, int]]] = {
    "1080": {"1,1": (1024, 1024), "4,3": (1440, 1056), "3,4": (1056, 1440), "16,9": (1920, 1056), "9,16": (1056, 1920)},
    "1024": {"1,1": (1024, 1024), "4,3": (1280, 1024), "3,4": (1024, 1280), "16,9": (1280, 768), "9,16": (768, 1280)},
    "720": {"1,1": (720, 720), "4,3": (960, 720), "3,4": (720, 960), "16,9": (1280, 720), "9,16": (720, 1280)},
    "480": {"1,1": (480, 480), "4,3": (640, 480), "3,4": (480, 640), "16,9": (832, 480), "9,16": (480, 832)},
}


def get_image_resolution(resolution: str, aspect: str = "16,9") -> tuple[int, int]:
    """Returns (width, height) for an image-mode resolution bucket."""
    return IMAGE_RES_SIZE_INFO[resolution][aspect]
