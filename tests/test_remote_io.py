"""Remote object-store backends (utils/remote_io.py) + remote webdataset
streaming (data/loaders.py ShardSpool), tested against an in-process fake
object store — the same endpoint-override trick minio/localstack users
apply to boto3. Parity: imaginaire/utils/easy_io/backends/ +
imaginaire/datasets/webdataset/ remote shard streaming.
"""

import io
import json
import os
import tarfile
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from cosmos_predict2_tpu.utils.remote_io import GCSBackend, S3Backend
from cosmos_predict2_tpu.utils import easy_io


class _FakeStore(BaseHTTPRequestHandler):
    """Speaks just enough S3 XML API and GCS JSON API for the backends."""

    objects: dict = {}  # (bucket, key) -> bytes

    def log_message(self, *a):
        pass

    def _send(self, code, body=b"", ctype="application/octet-stream"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(body)

    def _parse(self):
        parsed = urllib.parse.urlparse(self.path)
        return parsed.path.strip("/"), dict(urllib.parse.parse_qsl(parsed.query))

    def do_GET(self):
        path, q = self._parse()
        # GCS JSON API
        if path.startswith("storage/v1/b/"):
            parts = path.split("/")
            bucket = parts[3]
            if len(parts) >= 6 and parts[4] == "o" and parts[5]:
                key = urllib.parse.unquote(parts[5])
                data = self.objects.get((bucket, key))
                if data is None:
                    return self._send(404, b"{}", "application/json")
                if q.get("alt") == "media":
                    return self._send(200, data)
                return self._send(200, json.dumps({"name": key}).encode(), "application/json")
            # list
            prefix = q.get("prefix", "")
            items = [
                {"name": k} for (b, k) in sorted(self.objects) if b == bucket and k.startswith(prefix)
            ]
            return self._send(200, json.dumps({"items": items}).encode(), "application/json")
        # S3
        bucket, _, key = path.partition("/")
        if "list-type" in q:
            prefix = q.get("prefix", "")
            keys = [k for (b, k) in sorted(self.objects) if b == bucket and k.startswith(prefix)]
            xml = "<ListBucketResult>" + "".join(
                f"<Contents><Key>{k}</Key></Contents>" for k in keys
            ) + "<IsTruncated>false</IsTruncated></ListBucketResult>"
            return self._send(200, xml.encode(), "application/xml")
        data = self.objects.get((bucket, urllib.parse.unquote(key)))
        if data is None:
            return self._send(404, b"NoSuchKey")
        return self._send(200, data)

    do_HEAD = do_GET

    def do_PUT(self):
        path, _ = self._parse()
        bucket, _, key = path.partition("/")
        n = int(self.headers.get("Content-Length", 0))
        self.objects[(bucket, urllib.parse.unquote(key))] = self.rfile.read(n)
        self._send(200)

    def do_POST(self):
        # GCS media upload
        path, q = self._parse()
        if path.startswith("upload/storage/v1/b/"):
            bucket = path.split("/")[4]
            key = q["name"]
            n = int(self.headers.get("Content-Length", 0))
            self.objects[(bucket, key)] = self.rfile.read(n)
            return self._send(200, b"{}", "application/json")
        self._send(404)


@pytest.fixture(scope="module")
def store():
    _FakeStore.objects = {}
    server = ThreadingHTTPServer(("127.0.0.1", 0), _FakeStore)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


@pytest.mark.level(0)
def test_s3_backend_roundtrip(store):
    be = S3Backend(access_key="test", secret_key="secret", endpoint_url=store)
    be.put(b"hello tpu", "s3://bkt/dir/a.bin")
    assert be.get("s3://bkt/dir/a.bin") == b"hello tpu"
    assert be.exists("s3://bkt/dir/a.bin")
    assert not be.exists("s3://bkt/dir/missing.bin")
    be.put(b"x", "s3://bkt/dir/b.bin")
    assert sorted(be.list("s3://bkt/dir/")) == ["s3://bkt/dir/a.bin", "s3://bkt/dir/b.bin"]


@pytest.mark.level(0)
def test_gcs_backend_roundtrip(store):
    be = GCSBackend(token="fake", endpoint_url=store)
    be.put(b"gcs bytes", "gs://bkt2/x/y.bin")
    assert be.get("gs://bkt2/x/y.bin") == b"gcs bytes"
    assert be.exists("gs://bkt2/x/y.bin")
    assert not be.exists("gs://bkt2/x/nope.bin")
    assert list(be.list("gs://bkt2/x/")) == ["gs://bkt2/x/y.bin"]


@pytest.mark.level(0)
def test_easy_io_remote_load_dump(store):
    easy_io.register_backend("s3", S3Backend(access_key="k", secret_key="s", endpoint_url=store))
    easy_io.dump({"a": 1, "b": [2, 3]}, "s3://bkt/conf/cfg.json")
    assert easy_io.load("s3://bkt/conf/cfg.json") == {"a": 1, "b": [2, 3]}
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    easy_io.dump(arr, "s3://bkt/conf/w.npy")
    np.testing.assert_array_equal(easy_io.load("s3://bkt/conf/w.npy"), arr)
    assert easy_io.exists("s3://bkt/conf/w.npy")
    assert not easy_io.exists("s3://bkt/conf/nothing.npy")


def _make_tar(samples: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in samples.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


@pytest.mark.level(1)
def test_sharded_tar_dataset_streams_remote_shards(store, tmp_path):
    from cosmos_predict2_tpu.data.loaders import ShardedTarDataset

    be = S3Backend(access_key="k", secret_key="s", endpoint_url=store)
    easy_io.register_backend("s3", be)
    for si in range(2):
        samples = {}
        for i in range(3):
            key = f"{si}_{i:04d}"
            npy = io.BytesIO()
            np.save(npy, np.full((2, 2), si * 10 + i, dtype=np.int32))
            samples[f"{key}.npy"] = npy.getvalue()
            samples[f"{key}.txt"] = f"caption {key}".encode()
        be.put(_make_tar(samples), f"s3://data/shards/shard_{si:05d}.tar")

    ds = ShardedTarDataset(
        [f"s3://data/shards/shard_{si:05d}.tar" for si in range(2)],
        shuffle_seed=None,
        spool_dir=str(tmp_path / "spool"),
    )
    it = iter(ds)
    got = [next(it) for _ in range(6)]
    keys = sorted(s["__key__"] for s in got)
    assert keys == sorted(f"{si}_{i:04d}" for si in range(2) for i in range(3))
    s0 = next(s for s in got if s["__key__"] == "1_0002")
    np.testing.assert_array_equal(s0["npy"], np.full((2, 2), 12))
    assert s0["txt"] == "caption 1_0002"
    # epoch rollover works (shards re-downloaded after discard)
    assert next(it)["__key__"].endswith("0000")
    # spool stayed bounded: at most the look-ahead shard remains
    leftover = list((tmp_path / "spool").glob("*.tar"))
    assert len(leftover) <= 2


@pytest.mark.level(0)
def test_msc_backend_fake_client():
    """MSC backend adapter semantics vs a fake multistorageclient.

    Mirrors reference msc_backend.py: path_mapping longest-prefix rewrite,
    read/write/is_file/list delegation (ref easy_io/backends/msc_backend.py).
    """
    from cosmos_predict2_tpu.utils.remote_io import MSCBackend

    class Meta:
        def __init__(self, key):
            self.key = key

    class FakeClient:
        def __init__(self):
            self.blobs = {}

        def read(self, path):
            return self.blobs[path]

        def write(self, path, body):
            self.blobs[path] = bytes(body)

        def is_file(self, path):
            return path in self.blobs

        def is_empty(self, path):
            return not any(k.startswith(path) for k in self.blobs)

        def delete(self, path, recursive):
            del self.blobs[path]

        def list(self, path, include_directories, include_url_prefix):
            return [Meta(k) for k in sorted(self.blobs) if k.startswith(path)]

    fake = FakeClient()
    be = MSCBackend(client=fake, path_mapping={"s3://bucket/": "data/", "s3://bucket/deep/": "deep/"})
    be.put(b"hello", "msc://s3://bucket/a.txt")
    assert fake.blobs == {"data/a.txt": b"hello"}  # longest-prefix mapping applied
    be.put(b"x", "msc://s3://bucket/deep/b.bin")
    assert "deep/b.bin" in fake.blobs  # the more specific prefix wins
    assert be.get("msc://s3://bucket/a.txt") == b"hello"
    assert be.exists("msc://s3://bucket/a.txt")
    assert not be.exists("msc://s3://bucket/missing")
    assert list(be.list("msc://s3://bucket/")) == ["data/a.txt"]
    be.remove("msc://s3://bucket/a.txt")
    assert not be.exists("msc://s3://bucket/a.txt")

    # easy_io routing: registered msc backend serves load()
    easy_io.register_backend("msc", be)
    try:
        be.put(json.dumps({"k": 1}).encode(), "msc://s3://bucket/c.json")
        assert easy_io.load("msc://s3://bucket/c.json") == {"k": 1}
    finally:
        easy_io._BACKENDS.pop("msc", None)
