"""Unified file IO: load/dump dispatched by extension across backends.

Capability parity with the reference easy_io
(cosmos_predict2/_src/imaginaire/utils/easy_io/: backends x handlers):
``load(path)`` / ``dump(obj, path)`` pick a handler from the extension
(json / yaml / txt / npy / npz / pt|pth / safetensors / png|jpg / gif /
mp4 / csv / msgpack) and a backend from the scheme: local file, http(s)
read-only, and first-party s3:// / gs:// object-store clients
(utils/remote_io.py — stdlib SigV4 / JSON-API, no boto3 needed).
Custom backends (an object with get/put/exists, or a plain reader
callable) register via ``register_backend``.
"""

from __future__ import annotations

import io
import json
import os
from typing import Any, Callable

import numpy as np

_BACKENDS: dict[str, Any] = {}


def register_backend(scheme: str, backend: Any) -> None:
    """Register a backend: either an object with get(path)->bytes (and
    optionally put(bytes, path) / exists(path) / list(prefix)), or a bare
    reader callable (read-only)."""
    _BACKENDS[scheme] = backend


def get_backend(scheme: str):
    """Backend for a scheme; s3/gs instantiate lazily with default creds."""
    if scheme not in _BACKENDS:
        if scheme == "s3":
            from cosmos_predict2_tpu.utils.remote_io import S3Backend

            _BACKENDS[scheme] = S3Backend(
                credential_path=os.environ.get("COSMOS_S3_CREDENTIAL_PATH")
            )
        elif scheme == "gs":
            from cosmos_predict2_tpu.utils.remote_io import GCSBackend

            _BACKENDS[scheme] = GCSBackend()
        elif scheme == "msc":
            from cosmos_predict2_tpu.utils.remote_io import MSCBackend

            _BACKENDS[scheme] = MSCBackend(
                config_path=os.environ.get("MSC_CONFIG"),
                profile=os.environ.get("MSC_PROFILE", "default"),
            )
        else:
            raise NotImplementedError(f"no backend registered for scheme '{scheme}://'")
    return _BACKENDS[scheme]


def _scheme(path: str) -> str:
    return path.split("://", 1)[0] if "://" in path else ""


def _read_bytes(path: str) -> bytes:
    if path.startswith(("http://", "https://")):
        import urllib.request

        with urllib.request.urlopen(path) as r:
            return r.read()
    scheme = _scheme(path)
    if scheme:
        backend = get_backend(scheme)
        return backend.get(path) if hasattr(backend, "get") else backend(path)
    with open(path, "rb") as f:
        return f.read()


def _write_bytes(data: bytes, path: str) -> None:
    scheme = _scheme(path)
    if scheme:
        backend = get_backend(scheme)
        if not hasattr(backend, "put"):
            raise NotImplementedError(f"backend for '{scheme}://' is read-only")
        backend.put(data, path)
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


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
    if ext == "jsonl":
        return [json.loads(line) for line in _read_bytes(path).decode("utf-8").splitlines() if line.strip()]
    if ext in ("pkl", "pickle"):
        # Unpickling executes arbitrary code; remote (s3/gs/http) paths are
        # attacker-influenceable, so require an explicit opt-in there.
        # Prefer msgpack/npz for remote artifacts.
        if _scheme(path) and not kwargs.get("allow_pickle", False):
            raise ValueError(
                f"refusing to unpickle remote path {path!r}: pickle can execute "
                "arbitrary code. Pass allow_pickle=True if the source is trusted, "
                "or use .msgpack/.npz instead."
            )
        import pickle

        return pickle.loads(_read_bytes(path))
    if ext == "gz":
        # gzipped inner handler, e.g. .json.gz / .jsonl.gz / .txt.gz
        import gzip
        import tempfile

        inner = os.path.basename(path)[: -len(".gz")]
        data = gzip.decompress(_read_bytes(path))
        with tempfile.TemporaryDirectory() as td:
            local = os.path.join(td, inner)
            with open(local, "wb") as f:
                f.write(data)
            return load(local, **kwargs)
    if ext == "tar":
        import tarfile

        return tarfile.open(fileobj=io.BytesIO(_read_bytes(path)), mode="r")
    if ext in ("bin", "bytes"):
        return _read_bytes(path)
    raise NotImplementedError(f"no load handler for extension .{ext}")


def dump(obj: Any, path: str, **kwargs) -> str:
    scheme = _scheme(path)
    if scheme and not path.startswith(("http://", "https://")):
        # remote: serialize through a local temp file (reuses every
        # extension handler), then upload via the backend.
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            local = os.path.join(td, os.path.basename(path))
            written = dump(obj, local, **kwargs)
            with open(written, "rb") as f:
                data = f.read()
        # media handlers may change the extension (mp4 -> gif fallback)
        if os.path.basename(written) != os.path.basename(path):
            path = path.rsplit("/", 1)[0] + "/" + os.path.basename(written)
        _write_bytes(data, path)
        return path
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
    elif ext == "jsonl":
        with open(path, "w") as f:
            for row in obj:
                f.write(json.dumps(row, default=str) + "\n")
    elif ext in ("pkl", "pickle"):
        import pickle

        with open(path, "wb") as f:
            pickle.dump(obj, f)
    elif ext == "gz":
        import gzip
        import tempfile

        inner = os.path.basename(path)[: -len(".gz")]
        with tempfile.TemporaryDirectory() as td:
            local = os.path.join(td, inner)
            written = dump(obj, local, **kwargs)
            with open(written, "rb") as f:
                data = f.read()
        with open(path, "wb") as f:
            f.write(gzip.compress(data))
    elif ext in ("bin", "bytes"):
        with open(path, "wb") as f:
            f.write(obj)
    else:
        raise NotImplementedError(f"no dump handler for extension .{ext}")
    return path


def exists(path: str) -> bool:
    if "://" in path and not path.startswith(("http://", "https://")):
        backend = get_backend(_scheme(path))
        if hasattr(backend, "exists"):
            return backend.exists(path)
        raise NotImplementedError(f"exists() not supported by the '{_scheme(path)}://' backend")
    if path.startswith(("http://", "https://")):
        import urllib.request

        try:
            req = urllib.request.Request(path, method="HEAD")
            urllib.request.urlopen(req)
            return True
        except Exception:
            return False
    return os.path.exists(path)
