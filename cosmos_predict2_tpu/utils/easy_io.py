"""Unified file IO: load/dump dispatched by extension across backends.

Capability parity with the reference easy_io
(cosmos_predict2/_src/imaginaire/utils/easy_io/: backends x handlers):
``load(path)`` / ``dump(obj, path)`` pick a handler from the extension
(json / yaml / txt / npy / npz / pt|pth / safetensors / png|jpg / gif /
mp4 / csv / msgpack) and a backend from the scheme (local file, http(s)
read-only). Cloud backends (gs://, s3://) raise with a clear message in
this offline environment and can be registered via ``register_backend``.
"""

from __future__ import annotations

import io
import json
import os
from typing import Any, Callable

import numpy as np

_BACKENDS: dict[str, Callable[[str], bytes]] = {}


def register_backend(scheme: str, reader: Callable[[str], bytes]) -> None:
    _BACKENDS[scheme] = reader


def _read_bytes(path: str) -> bytes:
    if path.startswith(("http://", "https://")):
        import urllib.request

        with urllib.request.urlopen(path) as r:
            return r.read()
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme:
        if scheme in _BACKENDS:
            return _BACKENDS[scheme](path)
        raise NotImplementedError(f"no backend registered for scheme '{scheme}://'")
    with open(path, "rb") as f:
        return f.read()


def _ext(path: str) -> str:
    return os.path.splitext(path)[1].lower().lstrip(".")


def load(path: str, **kwargs) -> Any:
    ext = _ext(path)
    if ext == "json":
        return json.loads(_read_bytes(path))
    if ext in ("yaml", "yml"):
        import yaml

        return yaml.safe_load(_read_bytes(path))
    if ext == "txt":
        return _read_bytes(path).decode("utf-8")
    if ext == "npy":
        return np.load(io.BytesIO(_read_bytes(path)), allow_pickle=False)
    if ext == "npz":
        return dict(np.load(io.BytesIO(_read_bytes(path)), allow_pickle=False))
    if ext in ("pt", "pth"):
        import torch

        return torch.load(io.BytesIO(_read_bytes(path)), map_location="cpu", weights_only=True)
    if ext == "safetensors":
        from safetensors.numpy import load as st_load

        return st_load(_read_bytes(path))
    if ext in ("png", "jpg", "jpeg", "webp"):
        from cosmos_predict2_tpu.utils.io import read_image

        return read_image(path)
    if ext in ("mp4", "gif", "webm", "mkv"):
        from cosmos_predict2_tpu.utils.io import read_video

        return read_video(path, **kwargs)
    if ext == "csv":
        import csv

        return list(csv.reader(_read_bytes(path).decode("utf-8").splitlines()))
    if ext == "msgpack":
        from flax import serialization

        return serialization.msgpack_restore(_read_bytes(path))
    raise NotImplementedError(f"no load handler for extension .{ext}")


def dump(obj: Any, path: str, **kwargs) -> str:
    ext = _ext(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    if ext == "json":
        with open(path, "w") as f:
            json.dump(obj, f, indent=kwargs.get("indent", 2), default=str)
    elif ext in ("yaml", "yml"):
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(obj, f, sort_keys=False)
    elif ext == "txt":
        with open(path, "w") as f:
            f.write(obj)
    elif ext == "npy":
        np.save(path, obj)
    elif ext == "npz":
        np.savez(path, **obj)
    elif ext in ("pt", "pth"):
        import torch

        torch.save(obj, path)
    elif ext in ("png", "jpg", "jpeg", "mp4", "gif"):
        from cosmos_predict2_tpu.utils.io import save_img_or_video

        arr = np.asarray(obj)
        if arr.ndim == 3:
            arr = arr[None]
        return save_img_or_video(arr, path, fps=kwargs.get("fps", 16))
    elif ext == "csv":
        import csv

        with open(path, "w", newline="") as f:
            csv.writer(f).writerows(obj)
    elif ext == "msgpack":
        from flax import serialization

        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(obj))
    else:
        raise NotImplementedError(f"no dump handler for extension .{ext}")
    return path


def exists(path: str) -> bool:
    if "://" in path and not path.startswith(("http://", "https://")):
        raise NotImplementedError(f"exists() not supported for scheme of {path}")
    if path.startswith(("http://", "https://")):
        import urllib.request

        try:
            req = urllib.request.Request(path, method="HEAD")
            urllib.request.urlopen(req)
            return True
        except Exception:
            return False
    return os.path.exists(path)
