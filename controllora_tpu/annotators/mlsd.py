"""M-LSD line segment detector — MobileNetV2-FPN backbone + line decode.

Capability-parity target: reference annotator/mlsd/ (MobileV2_MLSD_Large,
mbv2_mlsd_large.py; decode utils.py:19-87). JAX/NHWC implementation:

  * backbone: truncated MobileNetV2 (4-ch input: RGB + ones-alpha), FPN taps at
    features {1,3,6,10,13},
  * head: BlockTypeA/B/C pyramid fusion to a 16-ch map; channels 7: = center logit +
    4 displacement channels (+ extras),
  * decode on-device: sigmoid -> 5x5 max-pool peak NMS -> top-k centers; segment
    filtering host-side (score/length thresholds, reference utils.py:47-87).

Weights import from the reference checkpoint naming (backbone.features.N...,
block15...block23). BatchNorm is inference-only: running stats are imported and applied
as an affine transform.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_IR_SETTING = [  # t, c, n, s (truncated MobileNetV2, reference mbv2_mlsd_large.py:173-181)
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
]
_FPN_SELECTED = (1, 3, 6, 10, 13)


class BN(nn.Module):
    """Inference-only batch norm: y = (x - mean) / sqrt(var + eps) * scale + bias."""

    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


def _conv(x, feats, k, stride, name, dtype, groups=1, dilation=1, bias=False):
    pad = dilation * (k // 2)
    return nn.Conv(
        feats, (k, k), strides=(stride, stride), padding=((pad, pad), (pad, pad)),
        feature_group_count=groups, kernel_dilation=(dilation, dilation),
        use_bias=bias, dtype=dtype, param_dtype=jnp.float32, name=name,
    )(x)


class ConvBNReLU(nn.Module):
    feats: int
    k: int = 3
    stride: int = 1
    groups: int = 1
    relu6: bool = True  # torchvision backbone uses ReLU6; the MLSD head uses plain ReLU
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _conv(x, self.feats, self.k, self.stride, "conv", self.dtype,
                  groups=self.groups)
        x = BN(dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        return jnp.minimum(x, 6.0) if self.relu6 else x


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        h = x
        if self.expand != 1:
            h = ConvBNReLU(hidden, k=1, dtype=self.dtype, name="expand")(h)
        h = ConvBNReLU(hidden, k=3, stride=self.stride, groups=hidden,
                       dtype=self.dtype, name="dw")(h)
        h = _conv(h, self.out_ch, 1, 1, "project", self.dtype)
        h = BN(dtype=self.dtype, name="project_bn")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            return x + h
        return h


class BlockTypeA(nn.Module):
    out_c1: int
    out_c2: int
    upscale: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        b = ConvBNReLU(self.out_c2, k=1, relu6=False, dtype=self.dtype, name="conv1")(b)
        a = ConvBNReLU(self.out_c1, k=1, relu6=False, dtype=self.dtype, name="conv2")(a)
        if self.upscale:
            bsz, h, w, c = b.shape
            # bilinear x2 with align_corners=True (reference BlockTypeA)
            b = _resize_align_corners(b, (h * 2, w * 2))
        return jnp.concatenate([a, b], axis=-1)


def _resize_align_corners(x, hw):
    b, h, w, c = x.shape
    H, W = hw
    ys = jnp.linspace(0.0, h - 1.0, H)
    xs = jnp.linspace(0.0, w - 1.0, W)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    out = (
        g(y0, x0) * (1 - wy) * (1 - wx)
        + g(y0, x1) * (1 - wy) * wx
        + g(y1, x0) * wy * (1 - wx)
        + g(y1, x1) * wy * wx
    )
    return out


class BlockTypeB(nn.Module):
    out_c: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBNReLU(x.shape[-1], k=3, relu6=False, dtype=self.dtype, name="conv1")(x)
        x = h + x
        return ConvBNReLU(self.out_c, k=3, relu6=False, dtype=self.dtype, name="conv2")(x)


class BlockTypeC(nn.Module):
    out_c: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = _conv(x, c, 3, 1, "conv1", self.dtype, dilation=5)
        h = nn.relu(BN(dtype=self.dtype, name="bn1")(h))
        h = _conv(h, c, 3, 1, "conv2", self.dtype)
        h = nn.relu(BN(dtype=self.dtype, name="bn2")(h))
        return _conv(h, self.out_c, 1, 1, "conv3", self.dtype, bias=True)


class MobileV2MLSDLarge(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, H, W, 4) in [-1,1] -> (B, H/2, W/2, 9) tpMap (center + 4 disp + extras)."""
        feats = []
        h = ConvBNReLU(32, k=3, stride=2, dtype=self.dtype, name="features_0")(x)
        feats.append(h)
        i = 1
        for t, c, n, s in _IR_SETTING:
            for j in range(n):
                h = InvertedResidual(c, s if j == 0 else 1, t, dtype=self.dtype,
                                     name=f"features_{i}")(h)
                feats.append(h)
                i += 1
        taps = [feats[k] for k in _FPN_SELECTED]
        c1, c2, c3, c4, c5 = taps

        x = BlockTypeA(64, 64, upscale=False, dtype=self.dtype, name="block15")(c4, c5)
        x = BlockTypeB(64, dtype=self.dtype, name="block16")(x)
        x = BlockTypeA(64, 64, dtype=self.dtype, name="block17")(c3, x)
        x = BlockTypeB(64, dtype=self.dtype, name="block18")(x)
        x = BlockTypeA(64, 64, dtype=self.dtype, name="block19")(c2, x)
        x = BlockTypeB(64, dtype=self.dtype, name="block20")(x)
        x = BlockTypeA(64, 64, dtype=self.dtype, name="block21")(c1, x)
        x = BlockTypeB(64, dtype=self.dtype, name="block22")(x)
        x = BlockTypeC(16, dtype=self.dtype, name="block23")(x)
        return x[:, :, :, 7:]


# ---------------------------------------------------------------------------- decode


@jax.jit
def decode_centers(tp_map: jnp.ndarray, topk: int = 200, ksize: int = 3):
    """(1, H, W, 9) -> (scores (topk,), ys, xs, displacement (H, W, 4)) — the
    reference's deccode_output_score_and_ptss (utils.py:19-44) on-device."""
    center = tp_map[0, :, :, 0]
    disp = tp_map[0, :, :, 1:5]
    heat = jax.nn.sigmoid(center)
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (ksize, ksize), (1, 1), "SAME"
    )
    keep = (hmax == heat).astype(heat.dtype)
    flat = (heat * keep).reshape(-1)
    scores, idx = jax.lax.top_k(flat, topk)
    w = heat.shape[1]
    return scores, idx // w, idx % w, disp


def pred_lines(
    image: np.ndarray,
    apply_fn,
    params,
    input_shape=(512, 512),
    score_thr: float = 0.10,
    dist_thr: float = 20.0,
) -> np.ndarray:
    """image: uint8 HWC RGB -> (N, 4) line segments [x0,y0,x1,y1] in image coords
    (reference utils.py:47-87)."""
    h, w = image.shape[:2]
    resized = np.asarray(
        jax.image.resize(jnp.asarray(image, jnp.float32),
                         (input_shape[0], input_shape[1], 3), "linear")
    )
    inp = np.concatenate([resized, np.ones((*input_shape, 1), np.float32)], axis=-1)
    inp = inp / 127.5 - 1.0
    tp_map = apply_fn(params, jnp.asarray(inp)[None])
    scores, ys, xs, disp = jax.device_get(decode_centers(tp_map))
    segs = []
    for s, y, x in zip(scores, ys, xs):
        d = disp[y, x]
        length = float(np.hypot(d[2] - d[0], d[3] - d[1]))
        if s > score_thr and length > dist_thr:
            segs.append([x + d[0], y + d[1], x + d[2], y + d[3]])
    if not segs:
        return np.zeros((0, 4), np.float32)
    lines = 2.0 * np.asarray(segs, np.float32)  # map 256 -> 512
    lines[:, 0::2] *= w / input_shape[1]
    lines[:, 1::2] *= h / input_shape[0]
    return lines


def mlsd_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference MLSD checkpoint naming -> flax params."""
    tree: Dict[str, Any] = {}

    def put_conv(path, w, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[
            "kernel" if leaf == "weight" else "bias"
        ] = _conv_kernel(w, path) if leaf == "weight" else w

    def _conv_kernel(w, path):
        # depthwise convs: torch (C,1,k,k) -> flax (k,k,1,C)
        if w.ndim == 4 and w.shape[1] == 1 and w.shape[0] > 1 and "dw" in path[-1]:
            return np.transpose(w, (2, 3, 1, 0))
        return np.transpose(w, (2, 3, 1, 0))

    def put_bn(path, leaf, w):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node = node.setdefault(path[-1], {})
        node[{"weight": "scale", "bias": "bias", "running_mean": "mean",
              "running_var": "var"}[leaf]] = w

    for key, w in sd.items():
        w = np.asarray(w)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "backbone":
            i = int(parts[2])
            mod = f"features_{i}"
            if i == 0:
                if parts[3] == "0":
                    put_conv((mod, "conv"), w, leaf)
                else:
                    put_bn((mod, "bn"), leaf, w)
            else:
                # InvertedResidual .conv sequential
                j = int(parts[4])
                expand = len([k for k in sd if k.startswith(
                    f"backbone.features.{i}.conv.3.")]) > 0
                if expand:  # [expand CBR, dw CBR, project conv, project bn]
                    seq = {"0": ("expand",), "1": ("dw",), "2": ("project_conv",),
                           "3": ("project_bn",)}[parts[4]]
                else:  # [dw CBR, project conv, project bn]
                    seq = {"0": ("dw",), "1": ("project_conv",), "2": ("project_bn",)}[
                        parts[4]
                    ]
                kind = seq[0]
                if kind in ("expand", "dw"):
                    if parts[5] == "0":
                        put_conv((mod, kind, "conv"), w, leaf)
                    else:
                        put_bn((mod, kind, "bn"), leaf, w)
                elif kind == "project_conv":
                    put_conv((mod, "project"), w, leaf)
                else:
                    put_bn((mod, "project_bn"), leaf, w)
        elif parts[0].startswith("block"):
            mod = parts[0]
            sub = parts[1]  # conv1/conv2/conv3
            if mod == "block23":
                if sub == "conv3":
                    put_conv((mod, "conv3"), w, leaf)
                else:
                    j = parts[2]
                    n = {"conv1": ("conv1", "bn1"), "conv2": ("conv2", "bn2")}[sub]
                    if j == "0":
                        put_conv((mod, n[0]), w, leaf)
                    else:
                        put_bn((mod, n[1]), leaf, w)
            else:
                j = parts[2]
                if j == "0":
                    put_conv((mod, sub, "conv"), w, leaf)
                else:
                    put_bn((mod, sub, "bn"), leaf, w)
        else:
            raise KeyError(f"unrecognized MLSD key {key}")
    return tree


def draw_lines(shape: Tuple[int, int], lines: np.ndarray, thickness: int = 1):
    """Rasterize white line segments on black (reference mlsd/__init__.py:65-77)."""
    canvas = np.zeros((*shape, 3), np.uint8)
    from controllora_tpu.annotators.openpose import _draw_line

    for x0, y0, x1, y1 in lines:
        _draw_line(canvas, (x0, y0), (x1, y1), (255, 255, 255), width=thickness * 2)
    return canvas


class MLSDdetector:
    """__call__(uint8 RGB HWC, thr_v, thr_d) -> uint8 HWC line map (reference
    annotator/mlsd/__init__.py)."""

    def __init__(self, params: Optional[Any] = None, rng_seed: int = 0):
        self.model = MobileV2MLSDLarge()
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, 64, 64, 4))
            )["params"]
        self.params = params
        self._jit = jax.jit(lambda p, x: self.model.apply({"params": p}, x))

    @classmethod
    def from_pretrained(cls, path: str) -> "MLSDdetector":
        from controllora_tpu.utils.torch_compat import load_state_dict

        return cls(mlsd_params_from_torch(load_state_dict(path)))

    def __call__(self, img: np.ndarray, thr_v: float = 0.1, thr_d: float = 0.1):
        lines = pred_lines(img, self._jit, self.params, (512, 512), thr_v, thr_d * 200)
        return draw_lines(img.shape[:2], lines)[:, :, 0]
