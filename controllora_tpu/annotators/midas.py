"""MiDaS depth (DPT-hybrid) — ViT-B/16 over a ResNetV2-50 stem with the DPT
RefineNet decoder, in flax/NHWC.

Capability-parity target: reference annotator/midas/ (MidasDetector ->
(depth_image, normal_image), __init__.py:13-38; DPTDepthModel dpt_depth.py;
vitb_rn50_384 hybrid backbone vit.py:290+; fusion blocks blocks.py:231-340).

Structure:
  * ResNetV2 stem (weight-standardized convs + GroupNorm32, pre-activation
    bottlenecks, stages (3, 4, 9)) — taps at stage0 (/4, 256ch) and stage1 (/8, 512ch),
  * ViT-B: 1x1 projection of the /16 stem output to 768, cls token, bilinearly
    resized position embeddings (arbitrary input sizes, reference vit.py:298-310),
    transformer taps at blocks 8 and 11 with 'project' readout,
  * reassemble (1x1 convs; layer4 3x3 stride-2) -> scratch 3x3 convs to 256 ->
    RefineNet fusion cascade -> depth head.

The normal-map post-process (Sobel gradients of depth, background threshold,
normalize; reference midas/__init__.py:28-37) runs as XLA ops.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------- resnetv2


def _stdconv(x, feats, k, stride, name, dtype, use_bias=False):
    """Conv slot for timm StdConv2d. Weight standardization is deterministic from the
    stored kernel, so it is baked into the imported weights (midas_params_from_torch)
    — numerically identical for inference."""
    return nn.Conv(
        feats, (k, k), strides=(stride, stride), padding=((k // 2, k // 2),) * 2,
        use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32, name=name,
    )(x)


class Bottleneck(nn.Module):
    """timm ResNetV2 post-activation bottleneck (preact=False, as built for the
    vit_base_r50 hybrid): conv->GN+ReLU x2, conv->GN, + normed downsample, ReLU."""

    out_ch: int
    mid_ch: int
    stride: int = 1
    proj: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def gn(name, h, act=True):
            h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32, name=name)(h.astype(jnp.float32))
            if act:
                h = nn.relu(h)
            return h.astype(self.dtype)

        shortcut = x
        if self.proj:
            shortcut = _stdconv(x, self.out_ch, 1, self.stride, "downsample_conv",
                                self.dtype)
            shortcut = gn("downsample_norm", shortcut, act=False)
        h = gn("norm1", _stdconv(x, self.mid_ch, 1, 1, "conv1", self.dtype))
        h = gn("norm2", _stdconv(h, self.mid_ch, 3, self.stride, "conv2", self.dtype))
        h = gn("norm3", _stdconv(h, self.out_ch, 1, 1, "conv3", self.dtype), act=False)
        return nn.relu(h + shortcut)


class ResNetV2Stem(nn.Module):
    """Stem + 3 stages (3, 4, 9 blocks); returns (/4 256ch, /8 512ch, /16 1024ch)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _stdconv(x, 64, 7, 2, "stem_conv", self.dtype)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="stem_norm")(
            h.astype(jnp.float32))
        h = nn.relu(h).astype(self.dtype)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        taps = []
        cfg = [(256, 64, 3), (512, 128, 4), (1024, 256, 9)]
        for si, (out_ch, mid_ch, n) in enumerate(cfg):
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                h = Bottleneck(
                    out_ch, mid_ch, stride=stride,
                    proj=(bi == 0), dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(h)
            taps.append(h)
        return taps  # [/4 256, /8 512, /16 1024]


# ---------------------------------------------------------------------------- vit


class ViTBlock(nn.Module):
    dim: int = 768
    heads: int = 12
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        h = ln("norm1")(x.astype(jnp.float32)).astype(self.dtype)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(h)
        b, l, _ = h.shape
        qkv = qkv.reshape(b, l, 3, self.heads, self.dim // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (q.shape[-1] ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, l, self.dim)
        x = x + nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name="proj")(attn)
        h = ln("norm2")(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(h)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(self.dtype)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(h)
        return x + h


# ---------------------------------------------------------------------------- dpt


class ResidualConvUnit(nn.Module):
    feats: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.feats, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.feats, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        return x + h


def _upx2_align_corners(x):
    b, h, w, c = x.shape
    from controllora_tpu.annotators.mlsd import _resize_align_corners

    return _resize_align_corners(x, (h * 2, w * 2))


class FeatureFusionBlock(nn.Module):
    feats: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, res=None):
        if res is not None:
            x = x + ResidualConvUnit(self.feats, self.dtype, name="resConfUnit1")(res)
        x = ResidualConvUnit(self.feats, self.dtype, name="resConfUnit2")(x)
        x = _upx2_align_corners(x)
        return nn.Conv(self.feats, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                       name="out_conv")(x)


class DPTHybridDepth(nn.Module):
    """Full DPT-hybrid depth model: (B, H, W, 3) normalized -> (B, H/2*2?, ...) depth.

    Input H, W must be multiples of 32 (stem /16 then ViT grid)."""

    features: int = 256
    vit_dim: int = 768
    hooks: Tuple[int, int] = (8, 11)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, H, W, _ = x.shape
        gh, gw = H // 16, W // 16
        c1, c2, c3 = ResNetV2Stem(self.dtype, name="backbone")(x)

        # patch projection + cls token + resized pos-embed
        tokens = nn.Conv(self.vit_dim, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="patch_proj")(c3)
        tokens = tokens.reshape(b, gh * gw, self.vit_dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.vit_dim))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, 1 + 24 * 24, self.vit_dim)
        )
        pos_tok, pos_grid = pos[:, :1], pos[:, 1:]
        gs_old = int(np.sqrt(pos_grid.shape[1]))
        pos_grid = pos_grid.reshape(1, gs_old, gs_old, self.vit_dim)
        pos_grid = jax.image.resize(pos_grid, (1, gh, gw, self.vit_dim), "bilinear")
        pos_grid = pos_grid.reshape(1, gh * gw, self.vit_dim)
        tokens = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.vit_dim)), tokens], 1)
        tokens = tokens + jnp.concatenate([pos_tok, pos_grid], 1).astype(tokens.dtype)

        taps = {}
        for i in range(12):
            tokens = ViTBlock(self.vit_dim, dtype=self.dtype, name=f"block{i}")(tokens)
            if i in self.hooks:
                taps[i] = tokens

        def readout_project(t, name):
            # 'project' readout: concat cls to every token, Linear+GELU
            # (reference vit.py:30-42)
            cls_t = jnp.broadcast_to(t[:, :1], t[:, 1:].shape)
            cat = jnp.concatenate([t[:, 1:], cls_t], axis=-1)
            h = nn.Dense(self.vit_dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"{name}_project")(cat)
            return jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)

        l3 = readout_project(taps[self.hooks[0]], "readout3").reshape(
            b, gh, gw, self.vit_dim)
        l4 = readout_project(taps[self.hooks[1]], "readout4").reshape(
            b, gh, gw, self.vit_dim)
        l3 = nn.Conv(768, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                     name="postprocess3")(l3)
        l4 = nn.Conv(768, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                     name="postprocess4_proj")(l4)
        l4 = nn.Conv(768, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="postprocess4_down")(l4)

        def rn(x, i, ch):
            return nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                           use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                           name=f"layer{i}_rn")(x)

        r1 = rn(c1, 1, 256)
        r2 = rn(c2, 2, 512)
        r3 = rn(l3, 3, 768)
        r4 = rn(l4, 4, 768)

        p4 = FeatureFusionBlock(self.features, self.dtype, name="refinenet4")(r4)
        p3 = FeatureFusionBlock(self.features, self.dtype, name="refinenet3")(p4, r3)
        p2 = FeatureFusionBlock(self.features, self.dtype, name="refinenet2")(p3, r2)
        p1 = FeatureFusionBlock(self.features, self.dtype, name="refinenet1")(p2, r1)

        h = nn.Conv(self.features // 2, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="head_conv1")(p1)
        h = _upx2_align_corners(h)
        h = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="head_conv3")(h)
        return nn.relu(h)[:, :, :, 0]


# ---------------------------------------------------------------------------- weights


def _std(w: np.ndarray) -> np.ndarray:
    """Apply weight standardization to a torch conv kernel (O,I,kh,kw) — timm StdConv
    standardizes at forward time; we bake it into the imported weights."""
    mean = w.mean(axis=(1, 2, 3), keepdims=True)
    var = w.var(axis=(1, 2, 3), keepdims=True)
    return (w - mean) / np.sqrt(var + 1e-8)


def midas_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """MiDaS dpt_hybrid checkpoint -> flax params. Key families:
    pretrained.model.patch_embed.backbone.* (resnetv2), pretrained.model.blocks.N.*,
    pretrained.model.{cls_token,pos_embed}, pretrained.act_postprocess{3,4}.*,
    scratch.layer{1..4}_rn, scratch.refinenet{1..4}, scratch.output_conv.*"""
    tree: Dict[str, Any] = {}

    def put(path, leaf, w, conv=False, stdconv=False):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node = node.setdefault(path[-1], {})
        if leaf == "weight" and conv:
            if stdconv:
                w = _std(w)
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
        if key.startswith("pretrained.model.patch_embed.backbone."):
            rest = parts[4:]
            if rest[0] == "stem":
                if rest[1] == "conv":
                    put(("backbone", "stem_conv"), leaf, w, conv=True, stdconv=True)
                else:
                    put(("backbone", "stem_norm"), leaf, w)
            elif rest[0] == "stages":
                si, bi = int(rest[1]), int(rest[3])
                base = ("backbone", f"stage{si}_block{bi}")
                sub = rest[4]
                if sub.startswith("conv"):
                    put(base + (sub,), leaf, w, conv=True, stdconv=True)
                elif sub.startswith("norm"):
                    put(base + (sub,), leaf, w)
                elif sub == "downsample":
                    if rest[5] == "conv":
                        put(base + ("downsample_conv",), leaf, w, conv=True,
                            stdconv=True)
                    else:
                        put(base + ("downsample_norm",), leaf, w)
                else:
                    raise KeyError(key)
            else:
                raise KeyError(key)
        elif key.startswith("pretrained.model.patch_embed.proj."):
            put(("patch_proj",), leaf, w, conv=True)
        elif key == "pretrained.model.cls_token":
            tree["cls_token"] = w
        elif key == "pretrained.model.pos_embed":
            tree["pos_embed"] = w
        elif key.startswith("pretrained.model.blocks."):
            bi = int(parts[3])
            base = (f"block{bi}",)
            sub = parts[4]
            if sub == "attn":
                put(base + ({"qkv": "qkv", "proj": "proj"}[parts[5]],), leaf, w)
            elif sub == "mlp":
                put(base + ({"fc1": "fc1", "fc2": "fc2"}[parts[5]],), leaf, w)
            elif sub in ("norm1", "norm2"):
                put(base + (sub,), leaf, w)
            else:
                raise KeyError(key)
        elif key.startswith("pretrained.model.norm."):
            continue  # final ViT norm unused by DPT taps
        elif key.startswith("pretrained.act_postprocess"):
            idx = int(parts[1][len("act_postprocess"):])
            seq = int(parts[2])
            if seq == 0:  # readout project Linear
                put((f"readout{idx}_project",), leaf, w)
            elif seq == 3:
                name = "postprocess3" if idx == 3 else "postprocess4_proj"
                put((name,), leaf, w, conv=True)
            elif seq == 4 and idx == 4:
                put(("postprocess4_down",), leaf, w, conv=True)
            else:
                raise KeyError(key)
        elif key.startswith("scratch.layer"):
            i = parts[1][len("layer"):-3]
            put((f"layer{i}_rn",), leaf, w, conv=True)
        elif key.startswith("scratch.refinenet"):
            i = parts[1][len("refinenet"):]
            base = (f"refinenet{i}",)
            if parts[2] == "out_conv":
                put(base + ("out_conv",), leaf, w, conv=True)
            else:
                put(base + (parts[2], parts[3]), leaf, w, conv=True)
        elif key.startswith("scratch.output_conv."):
            seq = int(parts[2])
            name = {0: "head_conv1", 2: "head_conv2", 4: "head_conv3"}[seq]
            put((name,), leaf, w, conv=True)
        else:
            raise KeyError(f"unrecognized MiDaS key: {key}")

    # readout project linear is stored under Sequential index 0.project.0
    return tree


# ---------------------------------------------------------------------------- detector


_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_SOBEL_Y = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)


@jax.jit
def depth_to_normal(depth: jnp.ndarray, a: float = 2 * np.pi, bg_th: float = 0.1):
    """Reference normal-map construction (midas/__init__.py:28-37)."""
    from controllora_tpu.annotators.canny import _conv2

    d = depth[:, :, None]
    gx = _conv2(d, _SOBEL_X)[:, :, 0]
    gy = _conv2(d, _SOBEL_Y)[:, :, 0]
    norm01 = (depth - depth.min()) / jnp.maximum(depth.max() - depth.min(), 1e-8)
    gx = jnp.where(norm01 < bg_th, 0.0, gx)
    gy = jnp.where(norm01 < bg_th, 0.0, gy)
    z = jnp.full_like(gx, a)
    n = jnp.stack([gx, gy, z], axis=-1)
    n = n / jnp.sqrt(jnp.sum(n**2, axis=-1, keepdims=True))
    return norm01, n


class MidasDetector:
    """__call__(uint8 RGB HWC) -> (depth uint8 HW, normal uint8 HWC)."""

    def __init__(self, params: Optional[Any] = None, rng_seed: int = 0):
        self.model = DPTHybridDepth()
        if params is None:
            # jit: eager flax init is thousands of host dispatches (~10 s);
            # compiled once, then served by the persistent compile cache
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, 64, 64, 3))
            )["params"]
        self.params = params
        self._jit = jax.jit(lambda p, x: self.model.apply({"params": p}, x))

    @classmethod
    def from_pretrained(cls, path: str) -> "MidasDetector":
        from controllora_tpu.utils.torch_compat import load_state_dict

        return cls(midas_params_from_torch(load_state_dict(path)))

    def __call__(self, input_image: np.ndarray, a=np.pi * 2.0, bg_th: float = 0.1):
        h, w = input_image.shape[:2]
        H = (h + 31) // 32 * 32
        W = (w + 31) // 32 * 32
        x = jnp.asarray(input_image, jnp.float32) / 127.5 - 1.0
        x = jax.image.resize(x, (H, W, 3), "linear")
        depth = self._jit(self.params, x[None])[0]
        depth = jax.image.resize(depth, (h, w), "linear")
        norm01, normal = depth_to_normal(depth, a, bg_th)
        depth_u8 = np.asarray(jnp.clip(norm01 * 255, 0, 255).astype(jnp.uint8))
        normal_u8 = np.asarray(
            jnp.clip(normal * 127.5 + 127.5, 0, 255).astype(jnp.uint8)
        )
        return depth_u8, normal_u8
