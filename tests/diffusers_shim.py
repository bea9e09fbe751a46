"""Minimal in-test `diffusers` shim: lets the UNMODIFIED reference `models.py` run.

The reference (reference/models.py:7-12) imports exactly seven diffusers-0.13 symbols:
BaseOutput, ConfigMixin/register_to_config, ModelMixin, get_down_block,
(Mish, Upsample2D, Downsample2D, upsample_2d, downsample_2d, partial), and
(CrossAttention, LoRALinearLayer). diffusers is not installed in this container, so this
module re-implements those symbols' 0.13 *behavior* (torch CPU) and registers them under
`sys.modules["diffusers..."]`, after which `load_reference_models()` imports
`/root/reference/models.py` verbatim from its own file.

This is the execution harness for tests/test_reference_parity.py — the first place the
north-star "bit-comparable" claim (SURVEY.md §6) is checked against the reference
IMPLEMENTATION rather than a transcription of it. Behavioral notes below cite the
diffusers 0.13 sources the reference was written against.

Only the code paths the reference actually exercises are implemented faithfully:
  * LoRALinearLayer: down/up Linear(bias=False), init N(0, 1/rank) / zeros
    (diffusers 0.13 models/cross_attention.py LoRALinearLayer),
  * CrossAttention: to_q/k/v Linear(bias=False), to_out [Linear, Dropout],
    head_to_batch_dim / batch_to_head_dim / get_attention_scores with
    scale = dim_head**-0.5 (diffusers 0.13 models/cross_attention.py),
  * Downsample2D(use_conv=True, padding=0): asymmetric (0,1,0,1) pad + k3 s2 conv
    (diffusers 0.13 models/resnet.py Downsample2D.forward),
  * ConfigMixin.from_config(json path | dict) filtering `_`-prefixed keys.
Paths the reference never reaches with its shipped configs (FIR kernels, the diffusers
get_down_block fallback, transposed-conv upsampling) raise if hit, so any silent
divergence from the real library is an error, not a wrong number.
"""

from __future__ import annotations

import importlib.util
import json
import sys
import types
from functools import partial

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_MODELS = "/root/reference/models.py"


# ------------------------------------------------------------------ outputs / config


class BaseOutput:
    """Enough of diffusers.utils.BaseOutput for `@dataclass class X(BaseOutput)`."""


def register_to_config(init):
    """Capture the full (defaults + passed) kwarg dict on the instance, like the
    diffusers decorator (configuration_utils.register_to_config)."""
    import functools
    import inspect

    sig = inspect.signature(init)

    @functools.wraps(init)
    def inner(self, *args, **kwargs):
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items()
               if k != "self" and not k.startswith("_")}
        object.__setattr__(self, "_shim_config", cfg)
        init(self, *args, **kwargs)

    return inner


class ConfigMixin:
    @classmethod
    def from_config(cls, config, **kwargs):
        if isinstance(config, str):
            with open(config) as f:
                config = json.load(f)
        config = {k: v for k, v in config.items() if not k.startswith("_")}
        config.update(kwargs)
        return cls(**config)

    @property
    def config(self):
        return dict(self._shim_config)


class ModelMixin(nn.Module):
    pass


# ------------------------------------------------------------------ resnet pieces


class Mish(nn.Module):
    def forward(self, x):
        return x * torch.tanh(F.softplus(x))


class Upsample2D(nn.Module):
    """Nearest 2x upsample (+ optional conv). Reference only constructs the
    use_conv=False flavor, and only on ConvBlock2D.up paths no config enables."""

    def __init__(self, channels, use_conv=False, use_conv_transpose=False,
                 out_channels=None, name="conv"):
        super().__init__()
        if use_conv_transpose:
            raise NotImplementedError("shim: transposed-conv upsample is never "
                                      "reached by the reference")
        self.channels = channels
        self.out_channels = out_channels or channels
        self.use_conv = use_conv
        if use_conv:
            self.conv = nn.Conv2d(self.channels, self.out_channels, 3, padding=1)

    def forward(self, hidden_states, output_size=None):
        hidden_states = F.interpolate(hidden_states, scale_factor=2.0, mode="nearest")
        if self.use_conv:
            hidden_states = self.conv(hidden_states)
        return hidden_states


class Downsample2D(nn.Module):
    """diffusers 0.13 models/resnet.py Downsample2D: with use_conv and padding=0 the
    input gets an ASYMMETRIC (left 0, right 1) zero pad before the k3 s2 conv — the
    semantics the reference picks via downsample_padding=0 (reference models.py:705)."""

    def __init__(self, channels, use_conv=False, out_channels=None, padding=1,
                 name="conv"):
        super().__init__()
        self.channels = channels
        self.out_channels = out_channels or channels
        self.use_conv = use_conv
        self.padding = padding
        if use_conv:
            conv = nn.Conv2d(self.channels, self.out_channels, 3, stride=2,
                             padding=padding)
        else:
            assert self.channels == self.out_channels
            conv = nn.AvgPool2d(kernel_size=2, stride=2)
        # 0.13 binds the module under `conv` for every `name` the reference uses
        # ("op"), giving the state-dict key `...downsamplers.0.conv.*`
        self.conv = conv

    def forward(self, hidden_states):
        assert hidden_states.shape[1] == self.channels
        if self.use_conv and self.padding == 0:
            hidden_states = F.pad(hidden_states, (0, 1, 0, 1), mode="constant", value=0)
        return self.conv(hidden_states)


def upsample_2d(*a, **k):
    raise NotImplementedError("shim: FIR upsample_2d is never reached by the reference")


def downsample_2d(*a, **k):
    raise NotImplementedError("shim: FIR downsample_2d is never reached by the reference")


# ------------------------------------------------------------------ attention


class LoRALinearLayer(nn.Module):
    """diffusers 0.13 models/cross_attention.py LoRALinearLayer."""

    def __init__(self, in_features, out_features, rank=4):
        super().__init__()
        if rank > min(in_features, out_features):
            raise ValueError(
                f"LoRA rank {rank} must be less or equal than "
                f"{min(in_features, out_features)}"
            )
        self.down = nn.Linear(in_features, rank, bias=False)
        self.up = nn.Linear(rank, out_features, bias=False)
        nn.init.normal_(self.down.weight, std=1 / rank)
        nn.init.zeros_(self.up.weight)

    def forward(self, hidden_states):
        orig_dtype = hidden_states.dtype
        dtype = self.down.weight.dtype
        down_hidden_states = self.down(hidden_states.to(dtype))
        up_hidden_states = self.up(down_hidden_states)
        return up_hidden_states.to(orig_dtype)


class CrossAttention(nn.Module):
    """diffusers 0.13 models/cross_attention.py CrossAttention — the projection
    weights + head reshapes + scaled-softmax scores the reference processors call."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=8, dim_head=64,
                 dropout=0.0, bias=False, upcast_attention=False,
                 upcast_softmax=False):
        super().__init__()
        inner_dim = dim_head * heads
        cross_attention_dim = (cross_attention_dim if cross_attention_dim is not None
                               else query_dim)
        self.upcast_attention = upcast_attention
        self.upcast_softmax = upcast_softmax
        self.scale = dim_head**-0.5
        self.heads = heads
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner_dim, query_dim),
                                     nn.Dropout(dropout)])

    def prepare_attention_mask(self, attention_mask, target_length, batch_size=None):
        if attention_mask is None:
            return None
        head_size = self.heads
        if attention_mask.shape[-1] != target_length:
            attention_mask = F.pad(attention_mask,
                                   (0, target_length - attention_mask.shape[-1]),
                                   value=0.0)
        if attention_mask.shape[0] < (batch_size or 1) * head_size:
            attention_mask = attention_mask.repeat_interleave(head_size, dim=0)
        return attention_mask

    def head_to_batch_dim(self, tensor):
        head_size = self.heads
        batch_size, seq_len, dim = tensor.shape
        tensor = tensor.reshape(batch_size, seq_len, head_size, dim // head_size)
        tensor = tensor.permute(0, 2, 1, 3).reshape(batch_size * head_size, seq_len,
                                                    dim // head_size)
        return tensor

    def batch_to_head_dim(self, tensor):
        head_size = self.heads
        batch_size, seq_len, dim = tensor.shape
        tensor = tensor.reshape(batch_size // head_size, head_size, seq_len, dim)
        tensor = tensor.permute(0, 2, 1, 3).reshape(batch_size // head_size, seq_len,
                                                    dim * head_size)
        return tensor

    def get_attention_scores(self, query, key, attention_mask=None):
        dtype = query.dtype
        if self.upcast_attention:
            query = query.float()
            key = key.float()
        attention_scores = torch.baddbmm(
            torch.empty(query.shape[0], query.shape[1], key.shape[1],
                        dtype=query.dtype, device=query.device),
            query, key.transpose(-1, -2), beta=0, alpha=self.scale,
        )
        if attention_mask is not None:
            attention_scores = attention_scores + attention_mask
        if self.upcast_softmax:
            attention_scores = attention_scores.float()
        attention_probs = attention_scores.softmax(dim=-1)
        return attention_probs.to(dtype)


# ------------------------------------------------------------------ unet blocks


def get_down_block(*args, **kwargs):
    raise NotImplementedError(
        "shim: the diffusers get_down_block fallback is only reached for non-"
        "SimpleDownEncoderBlock2D types, which no reference config uses"
    )


# ------------------------------------------------------------------ module wiring


def _module(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install() -> None:
    """Register the fake `diffusers` package tree in sys.modules (idempotent)."""
    root = _module("diffusers")
    utils = _module("diffusers.utils", outputs=None)
    outputs = _module("diffusers.utils.outputs", BaseOutput=BaseOutput)
    utils.outputs = outputs
    utils.BaseOutput = BaseOutput
    cfg = _module("diffusers.configuration_utils", ConfigMixin=ConfigMixin,
                  register_to_config=register_to_config)
    models = _module("diffusers.models")
    modeling = _module("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    blocks = _module("diffusers.models.unet_2d_blocks", get_down_block=get_down_block)
    resnet = _module("diffusers.models.resnet", Mish=Mish, Upsample2D=Upsample2D,
                     Downsample2D=Downsample2D, upsample_2d=upsample_2d,
                     downsample_2d=downsample_2d, partial=partial)
    xattn = _module("diffusers.models.cross_attention", CrossAttention=CrossAttention,
                    LoRALinearLayer=LoRALinearLayer)
    models.modeling_utils = modeling
    models.unet_2d_blocks = blocks
    models.resnet = resnet
    models.cross_attention = xattn
    root.utils = utils
    root.configuration_utils = cfg
    root.models = models


def load_reference_models():
    """Import the UNMODIFIED /root/reference/models.py under the shim and return it."""
    install()
    name = "reference_models_under_shim"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, REFERENCE_MODELS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def reseed_parameters(model: nn.Module, seed: int) -> None:
    """Overwrite EVERY parameter with seeded N(0, 0.2) values — fresh LoRA `up`
    factors are zeros by construction, which would make adapter parity vacuous."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen, dtype=p.dtype) * 0.2)
