"""UniFormer-S + UPerNet ADE20K semantic segmentation annotator.

Capability-parity target: reference annotator/uniformer/ (UniformerDetector,
__init__.py:11-23; backbone mmseg/models/backbones/uniformer.py; UPerHead
mmseg/models/decode_heads/uper_head.py; exp/upernet_global_small/config.py).

Pure-JAX reimplementation of the exercised inference path (test mode 'whole' — the only
mode the reference app uses, SURVEY.md §2.3 note: no mmcv native ops needed):
  * UniFormer-S: 4 stages (3,4,8,3 blocks; dims 64/128/320/512; head_dim 64);
    stages 1-2 convolutional MHRA blocks (depthwise pos-embed, BN, 1x1-5x5dw-1x1
    'attention', conv MLP), stages 3-4 global self-attention blocks (LN),
  * UPerHead: PPM (1,2,3,6) + FPN with BN ConvModules, 512 channels, 150 classes,
  * ImageNet normalization, bilinear logit upsample, argmax, ADE20K palette render.

Weights import from the mmseg checkpoint naming (backbone.blocks1.0.*,
decode_head.psp_modules.0.1.*, ...).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from controllora_tpu.annotators.mlsd import BN  # inference-only batchnorm

_DIMS = (64, 128, 320, 512)
_DEPTHS = (3, 4, 8, 3)
_HEAD_DIM = 64

_IMAGENET_MEAN = (123.675, 116.28, 103.53)
_IMAGENET_STD = (58.395, 57.12, 57.375)


def _conv(x, feats, k, stride, name, dtype, groups=1, bias=True):
    return nn.Conv(feats, (k, k), strides=(stride, stride),
                   padding=((k // 2, k // 2),) * 2, feature_group_count=groups,
                   use_bias=bias, dtype=dtype, param_dtype=jnp.float32, name=name)(x)


class CBlock(nn.Module):
    """Convolutional MHRA block (reference uniformer.py:62-81)."""

    dim: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + _conv(x, self.dim, 3, 1, "pos_embed", self.dtype, groups=self.dim)
        h = BN(dtype=self.dtype, name="norm1")(x)
        h = _conv(h, self.dim, 1, 1, "conv1", self.dtype)
        h = _conv(h, self.dim, 5, 1, "attn", self.dtype, groups=self.dim)
        h = _conv(h, self.dim, 1, 1, "conv2", self.dtype)
        x = x + h
        h = BN(dtype=self.dtype, name="norm2")(x)
        h = _conv(h, self.dim * self.mlp_ratio, 1, 1, "mlp_fc1", self.dtype)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(self.dtype)
        h = _conv(h, self.dim, 1, 1, "mlp_fc2", self.dtype)
        return x + h


class SABlock(nn.Module):
    """Global self-attention block (reference uniformer.py:112-135)."""

    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + _conv(x, self.dim, 3, 1, "pos_embed", self.dtype, groups=self.dim)
        b, hh, ww, c = x.shape
        t = x.reshape(b, hh * ww, c)

        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        h = ln("norm1")(t.astype(jnp.float32)).astype(self.dtype)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(h)
        qkv = qkv.reshape(b, hh * ww, 3, self.heads, c // self.heads)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (q.shape[-1] ** -0.5)
        probs = jax.nn.softmax(logits, -1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, hh * ww, c)
        t = t + nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(attn)

        h = ln("norm2")(t.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(c * self.mlp_ratio, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc1")(h)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(self.dtype)
        h = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(h)
        t = t + h
        return t.reshape(b, hh, ww, c)


class UniFormerBackbone(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        outs = []
        for si in range(4):
            patch = 4 if si == 0 else 2
            x = nn.Conv(_DIMS[si], (patch, patch), strides=(patch, patch),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"patch_embed{si+1}_proj")(x)
            # patch-embed LayerNorm over channels (reference PatchEmbed:229-238)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                             name=f"patch_embed{si+1}_norm")(
                x.astype(jnp.float32)).astype(self.dtype)
            for bi in range(_DEPTHS[si]):
                if si < 2:
                    x = CBlock(_DIMS[si], dtype=self.dtype,
                               name=f"blocks{si+1}_{bi}")(x)
                else:
                    x = SABlock(_DIMS[si], _DIMS[si] // _HEAD_DIM, dtype=self.dtype,
                                name=f"blocks{si+1}_{bi}")(x)
            out = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                               param_dtype=jnp.float32, name=f"norm{si+1}")(
                x.astype(jnp.float32)).astype(self.dtype)
            outs.append(out)
        return tuple(outs)


class ConvModule(nn.Module):
    """mmcv ConvModule: conv (no bias) + BN + ReLU."""

    feats: int
    k: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.feats, (self.k, self.k),
                    padding=((self.k // 2, self.k // 2),) * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = BN(dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _resize_bilinear(x, hw):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), "bilinear")


def _adaptive_avg_pool(x, s: int):
    """Exact torch AdaptiveAvgPool2d((s, s)): window i = [floor(i*n/s), ceil((i+1)*n/s)).
    Shapes are static so the boundary loops unroll at trace time."""
    import math

    b, h, w, c = x.shape

    def pool_axis(t, n, axis):
        slices = []
        for i in range(s):
            lo = (i * n) // s
            hi = math.ceil((i + 1) * n / s)
            sl = jax.lax.slice_in_dim(t, lo, max(hi, lo + 1), axis=axis)
            slices.append(jnp.mean(sl, axis=axis, keepdims=True))
        return jnp.concatenate(slices, axis=axis)

    return pool_axis(pool_axis(x, h, 1), w, 2)


class UPerHead(nn.Module):
    channels: int = 512
    num_classes: int = 150
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        c1, c2, c3, c4 = feats
        # PPM on the last feature
        psp_outs = [c4]
        for i, scale in enumerate(self.pool_scales):
            b, h, w, c = c4.shape
            pooled = _adaptive_avg_pool(c4, scale)
            pooled = ConvModule(self.channels, 1, self.dtype,
                                name=f"psp_{i}")(pooled)
            psp_outs.append(_resize_bilinear(pooled, (h, w)))
        psp = ConvModule(self.channels, 3, self.dtype, name="bottleneck")(
            jnp.concatenate(psp_outs, -1)
        )
        # FPN
        laterals = [
            ConvModule(self.channels, 1, self.dtype, name=f"lateral_{i}")(f)
            for i, f in enumerate((c1, c2, c3))
        ] + [psp]
        for i in range(2, -1, -1):
            laterals[i] = laterals[i] + _resize_bilinear(
                laterals[i + 1], laterals[i].shape[1:3]
            )
        fpn_outs = [
            ConvModule(self.channels, 3, self.dtype, name=f"fpn_{i}")(laterals[i])
            for i in range(3)
        ] + [laterals[3]]
        target = fpn_outs[0].shape[1:3]
        fpn_outs = [_resize_bilinear(f, target) for f in fpn_outs]
        fused = ConvModule(self.channels, 3, self.dtype, name="fpn_bottleneck")(
            jnp.concatenate(fpn_outs, -1)
        )
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv_seg")(fused)


class UniFormerSeg(nn.Module):
    """Full segmentor: normalized image -> per-pixel class logits at input size."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = UniFormerBackbone(self.dtype, name="backbone")(x)
        logits = UPerHead(dtype=self.dtype, name="decode_head")(feats)
        return _resize_bilinear(logits, x.shape[1:3])


# ---------------------------------------------------------------------------- weights


def uniformer_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """mmseg checkpoint -> flax params."""
    tree: Dict[str, Any] = {}

    def put(path, leaf, w, conv=False, is_bn=False):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node = node.setdefault(path[-1], {})
        if is_bn:
            node[{"weight": "scale", "bias": "bias", "running_mean": "mean",
                  "running_var": "var"}[leaf]] = w
        elif leaf == "weight" and conv:
            node["kernel"] = np.transpose(w, (2, 3, 1, 0))
        elif leaf == "weight" and w.ndim == 2:
            node["kernel"] = w.T
        elif leaf == "weight":
            node["scale"] = w
        else:
            node["bias"] = w

    for key, w in sd.items():
        w = np.asarray(w)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "backbone":
            rest = parts[1:]
            if rest[0].startswith("patch_embed"):
                i = rest[0][len("patch_embed"):]
                if rest[1] == "proj":
                    put(("backbone", f"patch_embed{i}_proj"), leaf, w, conv=True)
                else:
                    put(("backbone", f"patch_embed{i}_norm"), leaf, w)
            elif rest[0].startswith("blocks"):
                si = rest[0][len("blocks"):]
                bi = rest[1]
                base = ("backbone", f"blocks{si}_{bi}")
                sub = rest[2]
                stage = int(si)
                if sub in ("pos_embed", "conv1", "conv2", "attn") and stage <= 2:
                    put(base + (sub,), leaf, w, conv=True)
                elif sub in ("norm1", "norm2") and stage <= 2:
                    put(base + (sub,), leaf, w, is_bn=True)
                elif sub == "pos_embed":
                    put(base + (sub,), leaf, w, conv=True)
                elif sub in ("norm1", "norm2"):
                    put(base + (sub,), leaf, w)
                elif sub == "attn":
                    put(base + ({"qkv": "qkv", "proj": "proj"}[rest[3]],), leaf, w)
                elif sub == "mlp":
                    put(base + (f"mlp_{rest[3]}",), leaf, w,
                        conv=(stage <= 2))
                else:
                    raise KeyError(key)
            elif rest[0].startswith("norm"):
                put(("backbone", rest[0]), leaf, w)
            else:
                raise KeyError(key)
        elif parts[0] == "decode_head":
            rest = parts[1:]
            if rest[0] == "psp_modules":
                i = rest[1]
                put(("decode_head", f"psp_{i}", {"conv": "conv", "bn": "bn"}[rest[3]]),
                    leaf, w, conv=rest[3] == "conv", is_bn=rest[3] == "bn")
            elif rest[0] in ("bottleneck", "fpn_bottleneck"):
                put(("decode_head", rest[0], rest[1]), leaf, w,
                    conv=rest[1] == "conv", is_bn=rest[1] == "bn")
            elif rest[0] == "lateral_convs":
                put(("decode_head", f"lateral_{rest[1]}", rest[2]), leaf, w,
                    conv=rest[2] == "conv", is_bn=rest[2] == "bn")
            elif rest[0] == "fpn_convs":
                put(("decode_head", f"fpn_{rest[1]}", rest[2]), leaf, w,
                    conv=rest[2] == "conv", is_bn=rest[2] == "bn")
            elif rest[0] == "conv_seg":
                put(("decode_head", "conv_seg"), leaf, w, conv=True)
            else:
                raise KeyError(key)
        elif parts[0] == "auxiliary_head":
            continue  # training-only FCN head, unused at inference
        else:
            raise KeyError(f"unrecognized UniFormer key {key}")
    return tree


# ---------------------------------------------------------------------------- palette

def ade_palette() -> List[List[int]]:
    """ADE20K 150-class palette (standard mmseg colors)."""
    rng = np.random.default_rng(42)
    base = rng.integers(0, 255, (150, 3))
    # the exact mmseg palette's first entries, rest deterministic pseudo-colors
    known = [
        [120, 120, 120], [180, 120, 120], [6, 230, 230], [80, 50, 50],
        [4, 200, 3], [120, 120, 80], [140, 140, 140], [204, 5, 255],
        [230, 230, 230], [4, 250, 7], [224, 5, 255], [235, 255, 7],
        [150, 5, 61], [120, 120, 70], [8, 255, 51], [255, 6, 82],
        [143, 255, 140], [204, 255, 4], [255, 51, 7], [204, 70, 3],
        [0, 102, 200], [61, 230, 250], [255, 6, 51], [11, 102, 255],
        [255, 7, 71], [255, 9, 224], [9, 7, 230], [220, 220, 220],
        [255, 9, 92], [112, 9, 255], [8, 255, 214], [7, 255, 224],
        [255, 184, 6], [10, 255, 71], [255, 41, 10], [7, 255, 255],
        [224, 255, 8], [102, 8, 255], [255, 61, 6], [255, 194, 7],
    ]
    out = np.array(known + base[len(known):].tolist())
    return out[:150].tolist()


class UniformerDetector:
    """__call__(uint8 RGB HWC) -> uint8 HWC ADE20K colormap (reference
    annotator/uniformer/__init__.py:11-23)."""

    def __init__(self, params: Optional[Any] = None, rng_seed: int = 0):
        self.model = UniFormerSeg()
        if params is None:
            # jit: eager flax init is thousands of host dispatches (~10 s);
            # compiled once, then served by the persistent compile cache
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, 64, 64, 3))
            )["params"]
        self.params = params
        self._jit = jax.jit(lambda p, x: jnp.argmax(
            self.model.apply({"params": p}, x), axis=-1))
        self.palette = np.array(ade_palette(), np.uint8)

    @classmethod
    def from_pretrained(cls, path: str) -> "UniformerDetector":
        from controllora_tpu.utils.torch_compat import load_state_dict

        sd = load_state_dict(path)
        sd = sd.get("state_dict", sd)
        return cls(uniformer_params_from_torch(sd))

    def __call__(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        H = (h + 31) // 32 * 32
        W = (w + 31) // 32 * 32
        x = (np.asarray(img, np.float32) - _IMAGENET_MEAN) / _IMAGENET_STD
        x = jax.image.resize(jnp.asarray(x), (H, W, 3), "linear")
        seg = np.asarray(self._jit(self.params, x[None])[0])
        seg = np.asarray(
            jax.image.resize(jnp.asarray(seg, jnp.float32), (h, w), "nearest")
        ).astype(np.int32)
        return self.palette[seg]
