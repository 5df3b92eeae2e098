"""Validator descriptor library tests (reference imaginaire/utils/validator.py)."""

import pytest

from cosmos_predict2_tpu.utils import validator as V


class Params(V.ValidatedParams):
    steps = V.Int(default=35, min=1, max=200)
    guidance = V.Float(default=7.0, min=0.0, max=30.0)
    mode = V.OneOf(default="video", options=("video", "image"))
    frames = V.MultipleOf(default=8, multiple_of=4, type_cast=int)
    verbose = V.Bool(default=False)
    prompt = V.String(default="", max_len=16)


def test_defaults_and_assignment():
    p = Params()
    assert p.steps == 35 and p.mode == "video" and p.verbose is False
    p.steps = "12"  # string coercion
    assert p.steps == 12
    p.verbose = "true"
    assert p.verbose is True
    p.frames = "16"
    assert p.frames == 16


def test_range_and_option_rejection():
    p = Params()
    with pytest.raises(ValueError):
        p.steps = 0
    with pytest.raises(ValueError):
        p.steps = 201
    with pytest.raises(ValueError):
        p.guidance = -1.0
    with pytest.raises(ValueError):
        p.mode = "audio"
    with pytest.raises(ValueError):
        p.frames = 7
    with pytest.raises(TypeError):
        p.verbose = 3.14
    with pytest.raises(ValueError):
        p.prompt = "x" * 17


def test_mandatory_unset_raises():
    class Strict(V.ValidatedParams):
        required = V.Int(min=0)

    with pytest.raises(ValueError, match="mandatory"):
        _ = Strict().required
    with pytest.raises(ValueError, match="mandatory"):
        Strict.from_dict({})
    assert Strict.from_dict({"required": 5}).required == 5


def test_from_dict_rejects_unknown_and_hidden():
    with pytest.raises(ValueError, match="Unknown parameter"):
        Params.from_dict({"stepz": 5})

    class WithHidden(V.ValidatedParams):
        internal = V.Int(default=0, hidden=True)
        public = V.Int(default=1)

    with pytest.raises(ValueError, match="hidden"):
        WithHidden.from_dict({"internal": 3})
    assert "internal" not in WithHidden.schema()
    assert "public" in WithHidden.schema()


def test_schema_round_trip():
    s = Params.schema()
    assert s["steps"]["min"] == 1 and s["steps"]["max"] == 200
    assert sorted(s["mode"]["values"]) == ["image", "video"]
    d = Params.from_dict({"steps": 10, "mode": "image"}).to_dict()
    assert d["steps"] == 10 and d["mode"] == "image" and d["guidance"] == 7.0


def test_path_validators(tmp_path):
    img = tmp_path / "a.png"
    img.write_bytes(b"x")

    class P(V.ValidatedParams):
        image = V.InputImage(default=None)
        video = V.InputVideo(default=None)

    p = P()
    p.image = str(img)
    with pytest.raises(ValueError):
        p.video = str(img)  # wrong extension
    with pytest.raises(ValueError):
        p.image = str(tmp_path / "missing.png")


# ------------------------------ env parsers ------------------------------


@pytest.mark.level(0)
def test_env_parser_typed_from_env(monkeypatch):
    """EnvParser reads UPPER_CASE env vars through the validator
    descriptors with typed coercion (reference env_parser.py:46-53)."""
    from cosmos_predict2_tpu.utils.env_parsers import InferenceEnvParser

    monkeypatch.setenv("PORT", "9001")
    monkeypatch.setenv("CP_SIZE", "4")
    monkeypatch.setenv("OFFLOAD_GUARDRAILS", "true")
    p = InferenceEnvParser()
    assert p.PORT == 9001 and isinstance(p.PORT, int)
    assert p.CP_SIZE == 4
    assert p.OFFLOAD_GUARDRAILS is True
    assert p.PP_SIZE == 1  # default

    monkeypatch.setenv("PORT", "not_a_port")
    with pytest.raises(ValueError):
        InferenceEnvParser()


@pytest.mark.level(0)
def test_env_parser_b64_roundtrip(monkeypatch):
    """The whole parameter set round-trips through one base64 JSON string
    (the launcher->worker deployment contract, env_parser.py:63-77)."""
    from cosmos_predict2_tpu.utils.env_parsers import InferenceEnvParser

    monkeypatch.setenv("TP_SIZE", "2")
    p = InferenceEnvParser()
    b64 = p.to_b64()
    monkeypatch.delenv("TP_SIZE")
    restored = InferenceEnvParser(b64)
    assert restored.TP_SIZE == 2
    assert restored.to_dict() == p.to_dict()


@pytest.mark.level(0)
def test_credential_env_parser_backend_args(monkeypatch):
    """Credential roles format directly into remote_io backend_args
    (cred_env_parser.py:20-43, reshaped for utils/remote_io)."""
    from cosmos_predict2_tpu.utils.env_parsers import CredentialEnvParser

    monkeypatch.setenv("CHECKPOINT_ACCESS_KEY_ID", "AKID")
    monkeypatch.setenv("CHECKPOINT_SECRET_ACCESS_KEY", "SECRET")
    monkeypatch.setenv("CHECKPOINT_REGION_NAME", "eu-west-1")
    c = CredentialEnvParser()
    args = c.backend_args("checkpoint")
    assert args["access_key_id"] == "AKID"
    assert args["secret_access_key"] == "SECRET"
    assert args["region_name"] == "eu-west-1"
    assert args["endpoint_url"].startswith("https://")
    with pytest.raises(ValueError, match="role"):
        c.backend_args("nope")
