"""Import the CUDA/torch reference on CPU for numerics-parity tests.

The reference package (/root/reference) guards import behind a CUDA extra
and pulls GPU-only / uninstalled deps (megatron, transformer_engine,
loguru, diffusers, ...). For *numerics parity* we only need the pure-torch
math — the Wan VAE (tokenizers/wan2pt1.py:264-592 is TE-free) and the
FlowUniPC scheduler (models/fm_solvers_unipc.py) — so this module installs
minimal fakes in sys.modules before importing those files.

PARITY-ONLY: nothing here is shipped; it exists so tests can pin the JAX
implementations against the actual reference code instead of
self-generated goldens.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REFERENCE = "/root/reference"


def _mod(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    # a real ModuleSpec: importlib.util.find_spec(name) reads module.__spec__
    # for already-imported modules and raises ValueError on None (transformers
    # probes e.g. torchvision this way)
    m.__spec__ = importlib.util.spec_from_loader(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _noop(*a, **k):
    return None


_installed = False


def install_shims() -> None:
    global _installed
    if _installed:
        return
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    # --- cosmos_cuda: satisfy the CUDA-extra version guard -------------
    spec = importlib.util.spec_from_file_location(
        "_cosmos_about", f"{REFERENCE}/cosmos_predict2/__about__.py"
    )
    about = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(about)
    _mod("cosmos_cuda", __version__=about.__version__)

    # --- megatron.core.parallel_state (CP plumbing; unused on 1 CPU) ---
    ps = _mod(
        "megatron.core.parallel_state",
        get_context_parallel_group=_noop,
        get_context_parallel_world_size=lambda *a, **k: 1,
        get_context_parallel_rank=lambda *a, **k: 0,
        is_initialized=lambda: False,
    )
    core = _mod("megatron.core", parallel_state=ps)
    _mod("megatron", core=core)

    # --- transformer_engine: the reference DiT only needs RMSNorm and
    # apply_rotary_pos_emb at runtime (with atten_backend="torch" the TE
    # DotProductAttention import never executes). Both are implemented for
    # real here, to TE semantics, so the reference MiniTrainDIT runs on CPU.
    import torch

    class _TERMSNorm(torch.nn.Module):
        def __init__(self, hidden_size, eps=1e-6, **kw):
            super().__init__()
            self.eps = eps
            self.weight = torch.nn.Parameter(torch.ones(hidden_size))

        def reset_parameters(self):
            torch.nn.init.ones_(self.weight)

        def forward(self, x):
            xf = x.float()
            out = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)
            return out.type_as(x) * self.weight

    def _te_apply_rotary_pos_emb(t, freqs, tensor_format="bshd", fused=True):
        # t: (B,S,H,D) for bshd; freqs: (S,1,1,D2) angles (duplicated halves).
        # TE formula: t*cos + rotate_half(t)*sin in fp32, cast back.
        ts = t.transpose(0, 1) if tensor_format == "bshd" else t  # (S,B,H,D)
        rot_dim = freqs.shape[-1]
        t_rot, t_pass = ts[..., :rot_dim], ts[..., rot_dim:]
        cos = torch.cos(freqs.float())
        sin = torch.sin(freqs.float())
        x = t_rot.float()
        d2 = rot_dim // 2
        rotated = torch.cat([-x[..., d2:], x[..., :d2]], dim=-1)
        out = (x * cos + rotated * sin).to(t.dtype)
        out = torch.cat([out, t_pass], dim=-1)
        return out.transpose(0, 1) if tensor_format == "bshd" else out

    class _TEDotProductAttention(torch.nn.Module):
        """bshd dot-product attention to TE semantics (fp32 softmax,
        output flattened to (B, S, H*D)). The multiview cross-attention
        constructs its Attention without a backend override, so the TE op
        is exercised on CPU through this faithful stand-in."""

        def __init__(self, num_heads, head_dim, num_gqa_groups=None, attention_dropout=0,
                     qkv_format="bshd", attn_mask_type="no_mask", **kw):
            super().__init__()
            assert qkv_format == "bshd", qkv_format

        def forward(self, q, k, v, **kw):
            qt, kt, vt = (t.transpose(1, 2).float() for t in (q, k, v))
            out = torch.nn.functional.scaled_dot_product_attention(qt, kt, vt)
            out = out.transpose(1, 2).to(q.dtype)
            return out.reshape(out.shape[0], out.shape[1], -1)

        def set_context_parallel_group(self, *a, **k):
            return None

    te_attention = _mod(
        "transformer_engine.pytorch.attention",
        apply_rotary_pos_emb=_te_apply_rotary_pos_emb,
        DotProductAttention=_TEDotProductAttention,
    )
    te_distributed = _mod(
        "transformer_engine.pytorch.distributed",
        get_all_rng_states=lambda: {},
        graph_safe_rng_available=lambda: False,
    )
    class _TEBaseModule(torch.nn.Module):
        pass

    te_module_base = _mod(
        "transformer_engine.pytorch.module.base", TransformerEngineBaseModule=_TEBaseModule
    )
    te_module = _mod("transformer_engine.pytorch.module", base=te_module_base)
    te_graph = _mod(
        "transformer_engine.pytorch.graph",
        make_graphed_callables=lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("cuda-graph shim: not available in parity tests")
        ),
    )
    te_pytorch = _mod(
        "transformer_engine.pytorch",
        RMSNorm=_TERMSNorm,
        attention=te_attention,
        distributed=te_distributed,
        module=te_module,
        graph=te_graph,
    )
    _mod("transformer_engine", pytorch=te_pytorch, __version__="1.14.0")

    # --- flash_attn rotary (wan2pt1.rope_apply calls it with
    # interleaved=True; implemented faithfully so the reference WanModel
    # runs on CPU: pairs (x[2i], x[2i+1]) rotated by (cos_i, sin_i)) ------
    def _fa_apply_rotary_emb(x, cos, sin, interleaved=True, inplace=False):
        assert interleaved, "shim implements the interleaved layout only"
        xf = x.float()
        x1, x2 = xf[..., 0::2], xf[..., 1::2]
        # cos/sin: (S, rot/2) -> broadcast over (B, S, H, rot/2)
        c = cos.float()[None, :, None, :]
        s = sin.float()[None, :, None, :]
        o1 = x1 * c - x2 * s
        o2 = x1 * s + x2 * c
        out = torch.stack([o1, o2], dim=-1).reshape(x.shape)
        return out.to(x.dtype)

    fa_rotary_mod = _mod("flash_attn.layers.rotary", apply_rotary_emb=_fa_apply_rotary_emb)
    fa_layers = _mod("flash_attn.layers", rotary=fa_rotary_mod)
    _mod("flash_attn", layers=fa_layers, __version__="2.6.0")

    # --- torchvision (interactive dit_causal imports transforms; its
    # forward never uses them in the parity configs) ----------------------
    tv_transforms = _mod("torchvision.transforms")
    _mod("torchvision", transforms=tv_transforms, __version__="0.20.0")

    # --- boto3/botocore (S3 IO; parity tests only touch local tensors) --
    class _FakeClient:
        def __getattr__(self, name):
            raise RuntimeError("boto3 shim: no network in parity tests")

    class _FakeConfig:
        def __init__(self, *a, **k):
            pass

    _mod("boto3", client=lambda *a, **k: _FakeClient(), Session=_FakeClient)
    _mod("botocore")
    _mod("botocore.config", Config=_FakeConfig)
    _mod("botocore.exceptions", ClientError=RuntimeError, NoCredentialsError=RuntimeError)
    _mod(
        "multistorageclient",
        StorageClient=_FakeClient,
        StorageClientConfig=_FakeClient,
    )
    _mod("multistorageclient.types", MSC_PROTOCOL="msc://")

    # --- fvcore (lazy_config re-exports its Registry) --------------------
    class _Registry:
        def __init__(self, name="shim"):
            self._name = name
            self._map = {}

        def register(self, obj=None):
            if obj is None:
                return lambda o: o
            return obj

        def get(self, name):
            return self._map[name]

    fv_registry = _mod("fvcore.common.registry", Registry=_Registry)
    fv_common = _mod("fvcore.common", registry=fv_registry)
    _mod("fvcore", common=fv_common)

    # --- iopath (lazy_config PathManager plumbing; unused in parity) -----
    class PathHandler:
        pass

    class _PathManager:
        def register_handler(self, *a, **k):
            pass

        def open(self, path, mode="r", **k):
            return open(path, mode)

        def exists(self, path):
            import os as _os

            return _os.path.exists(path)

    iopath_fio = _mod(
        "iopath.common.file_io",
        HTTPURLHandler=PathHandler,
        OneDrivePathHandler=PathHandler,
        PathHandler=PathHandler,
        PathManager=_PathManager,
        PathManagerFactory=types.SimpleNamespace(get=lambda *a, **k: _PathManager()),
        g_pathmgr=_PathManager(),
    )
    iopath_common = _mod("iopath.common", file_io=iopath_fio)
    _mod("iopath", common=iopath_common)

    # --- omegaconf (conditioner.py type hints / isinstance only) --------
    class DictConfig(dict):
        pass

    class ListConfig(list):
        pass

    class OmegaConf:
        @staticmethod
        def to_container(x, **k):
            return x

        @staticmethod
        def create(x=None, **k):
            return DictConfig(x or {})

        @staticmethod
        def register_new_resolver(*a, **k):
            return None

        @staticmethod
        def is_config(x):
            return isinstance(x, (DictConfig, ListConfig))

    _mod("omegaconf", DictConfig=DictConfig, ListConfig=ListConfig, OmegaConf=OmegaConf)
    import enum as _enum

    class SCMode(_enum.Enum):
        DICT = 1
        DICT_CONFIG = 2
        INSTANTIATE = 3

    _mod("omegaconf.base", DictKeyType=str, SCMode=SCMode)
    _mod(
        "omegaconf.basecontainer",
        BaseContainer=dict,
    )
    _mod("omegaconf.errors", OmegaConfBaseException=Exception)

    # --- torchvision: the DiT resizes the padding mask with nearest
    # interpolation at runtime — implement resize for real; the clip.py
    # transform constructors are runtime-only and stay no-ops.
    class _T:
        def __getattr__(self, name):
            return lambda *a, **k: (lambda x: x)

    def _tv_resize(img, size, interpolation=None, antialias=None):
        x, added = img, 0
        while x.ndim < 4:
            x, added = x.unsqueeze(0), added + 1
        out = torch.nn.functional.interpolate(x.float(), size=tuple(size), mode="nearest").to(img.dtype)
        for _ in range(added):
            out = out.squeeze(0)
        return out

    import enum as _enum2

    class _InterpolationMode(_enum2.Enum):
        NEAREST = "nearest"
        BILINEAR = "bilinear"

    tv_functional = _mod("torchvision.transforms.functional", resize=_tv_resize)
    tv_transforms = _mod(
        "torchvision.transforms",
        functional=tv_functional,
        InterpolationMode=_InterpolationMode,
    )
    tv_transforms.Compose = lambda fns: (lambda x: x)
    tv_transforms.Normalize = _T().Normalize
    tv_transforms.Resize = _T().Resize
    tv_transforms.CenterCrop = _T().CenterCrop
    tv_transforms.ToTensor = _T().ToTensor
    _mod("torchvision", transforms=tv_transforms)

    # --- pynvml (GPU monitoring; never called on CPU) -------------------
    _mod(
        "pynvml",
        nvmlInit=_noop,
        nvmlShutdown=_noop,
        nvmlDeviceGetHandleByIndex=_noop,
        nvmlDeviceGetMemoryInfo=_noop,
        nvmlDeviceGetUtilizationRates=_noop,
    )

    # --- loguru: map to std logging -------------------------------------
    import logging

    class _Logger:
        def __init__(self, *a, **k):
            self._l = logging.getLogger("reference")
            # loguru's internal options tuple: (exception, depth, record,
            # lazy, colors, raw, capture, patchers, extra)
            self._options = (None, 1, False, False, False, False, True, [], {})

        def opt(self, *a, **k):
            return self

        def bind(self, *a, **k):
            return self

        def remove(self, *a, **k):
            return None

        def add(self, *a, **k):
            return 0

        def level(self, name, *a, **k):
            return types.SimpleNamespace(name=name, no=20)

        def log(self, level, msg, *a, **k):
            self._l.info(msg)

        def __getattr__(self, name):
            if name in ("trace", "debug", "info", "success", "warning", "error", "critical", "exception"):
                return lambda msg, *a, **k: self._l.info(str(msg))
            raise AttributeError(name)

    class _Core:
        def __init__(self, *a, **k):
            self.levels = {}
            self.handlers = {}
            self.extra = {}

    logger = _Logger()
    _mod("loguru", logger=logger)
    _mod("loguru._logger", Core=_Core, Logger=_Logger)

    # --- diffusers: just enough SchedulerMixin/ConfigMixin for UniPC ----
    class ConfigMixin:
        config_name = "scheduler_config.json"

        @property
        def config(self):
            return types.SimpleNamespace(**getattr(self, "_internal_dict", {}))

    def register_to_config(init):
        import functools
        import inspect

        @functools.wraps(init)
        def wrapped(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            d = dict(bound.arguments)
            d.pop("self", None)
            self._internal_dict = d
            init(self, *args, **kwargs)

        return wrapped

    class SchedulerMixin:
        pass

    class SchedulerOutput:
        def __init__(self, prev_sample=None):
            self.prev_sample = prev_sample

    import enum

    class KarrasDiffusionSchedulers(enum.Enum):
        UniPCMultistepScheduler = 1

    diffusers = _mod("diffusers", ConfigMixin=ConfigMixin, SchedulerMixin=SchedulerMixin)
    _mod(
        "diffusers.configuration_utils",
        ConfigMixin=ConfigMixin,
        register_to_config=register_to_config,
    )
    _mod("diffusers.schedulers")
    _mod(
        "diffusers.schedulers.scheduling_utils",
        KarrasDiffusionSchedulers=KarrasDiffusionSchedulers,
        SchedulerMixin=SchedulerMixin,
        SchedulerOutput=SchedulerOutput,
    )
    _mod("diffusers.utils", deprecate=_noop)
    diffusers.utils = sys.modules["diffusers.utils"]

    # --- heavy cosmos-internal deps of clip.py we don't need for parity --
    # (conditioner pulls the whole lazy_config/omegaconf stack; the umt5
    # tokenizer pulls HF downloads; attention is the GPU dispatch). The
    # parity targets — XLMRoberta / XLMRobertaWithHead — touch none of them.
    import torch as _torch

    import enum as _enum3

    class _DataType(str, _enum3.Enum):
        IMAGE = "image"
        VIDEO = "video"
        MIX = "mix"

        def __str__(self):
            return self.value

    _mod(
        "cosmos_predict2._src.predict2.conditioner",
        AbstractEmbModel=_torch.nn.Module,
        DataType=_DataType,
    )
    _mod("cosmos_predict2._src.predict2.inference.get_umt5_emb", HuggingfaceTokenizer=object)

    # (networks/attention.py imports cleanly on CPU: flash_attn_3 is inside
    # try/except and the SDPA path is pure torch — no stub needed.)

    _installed = True


_reason1_installed = False


def install_reason1_shims() -> None:
    """Extra fakes for importing the reference text-encoder / reason1 stack
    (text_encoders/text_encoder.py pulls vlm_qwen -> qwen2_5_vl, which
    asserts flash-attn at import, plus apex FusedAdam and omegaconf
    submodules). Parity tests only exercise the pure pooling math, never
    the faked kernels."""
    global _reason1_installed
    install_shims()
    if _reason1_installed:
        return
    import sys as _sys

    om = _sys.modules["omegaconf"]
    _mod("omegaconf.dictconfig", DictConfig=om.DictConfig)
    _mod("omegaconf.listconfig", ListConfig=om.ListConfig)
    mta = _mod("apex.multi_tensor_apply", multi_tensor_applier=_noop)
    _mod("apex", multi_tensor_apply=mta)
    _mod("amp_C", multi_tensor_adam=_noop, multi_tensor_l2norm=_noop, multi_tensor_scale=_noop)
    # keep install_shims' FAITHFUL rotary (wan2pt1 parity uses it); only add
    # the kernel entry points qwen2_5_vl asserts on (never actually called)
    fa = _sys.modules["flash_attn"]
    fa.flash_attn_varlen_func = _noop
    fa.flash_attn_func = _noop
    fa.__version__ = "2.8.1"
    import transformers.utils as tu

    tu.is_flash_attn_2_available = lambda: True
    _reason1_installed = True


_model_installed = False


def install_model_shims() -> None:
    """Fakes for importing the reference MODEL layer (video2world RF model
    with its real conditioner): hydra ConfigStore, wandb, and removal of the
    minimal conditioner stand-in so the genuine predict2 conditioner module
    loads. Parity tests drive the real denoise()/conditioner math on CPU."""
    global _model_installed
    install_reason1_shims()
    if _model_installed:
        return
    import sys as _sys

    class _ConfigStore:
        _inst = None

        @classmethod
        def instance(cls):
            if cls._inst is None:
                cls._inst = cls()
            return cls._inst

        def store(self, *a, **k):
            return None

    cs = _mod("hydra.core.config_store", ConfigStore=_ConfigStore)
    core = _mod("hydra.core", config_store=cs)
    _mod("hydra", core=core)

    wr = _mod("wandb.sdk.wandb_run", Run=object)
    sdk = _mod("wandb.sdk", wandb_run=wr)
    util = _mod("wandb.util", generate_id=lambda *a, **k: "x")
    _mod(
        "wandb",
        sdk=sdk,
        util=util,
        init=_noop,
        log=_noop,
        run=None,
        Settings=object,
        Artifact=object,
    )

    # rectified_flow.py imports (but does not need at import time) the
    # diffusers euler scheduler
    class _FlowMatchEulerDiscreteScheduler:
        def __init__(self, *a, **k):
            raise RuntimeError("diffusers shim: not constructible in parity tests")

    _sys.modules["diffusers"].FlowMatchEulerDiscreteScheduler = _FlowMatchEulerDiscreteScheduler

    # replace the minimal conditioner stand-in with the real module
    # (modules that already did `from ...conditioner import X` keep their
    # references; new imports get the genuine classes)
    _sys.modules.pop("cosmos_predict2._src.predict2.conditioner", None)
    _model_installed = True


def import_reference(dotted: str):
    """install_shims() then import a reference module by dotted path."""
    install_shims()
    import importlib

    return importlib.import_module(dotted)
