"""HED soft-edge annotator — 5-stage VGG edge net with 1x1 score heads
(capability-parity target: reference annotator/hed/__init__.py:9-94).

JAX/NHWC implementation; weights import from the ControlNet `network-bsds500.pth`
checkpoint naming (netVggOne.0.weight, netScoreOne.weight, netCombine.0.weight — the
reference remaps 'module'->'net' the same way, annotator/hed/__init__.py:70).
The `nms` scribble post-process (Gaussian blur + 4-direction directional dilate +
threshold, reference :117-132) runs as XLA ops.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Caffe-era BGR mean (the reference feeds BGR: input_image[:, :, ::-1], then subtracts
# this mean, annotator/hed/__init__.py:78-79, 106-109)
_BGR_MEAN = (104.00698793, 116.66876762, 122.67891434)

_STAGES = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))
_STAGE_NAMES = ("One", "Two", "Thr", "Fou", "Fiv")


class HEDNetwork(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_bgr01: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) BGR in [0,1] -> (B, H, W, 1) edge probability."""
        b, H, W, _ = x_bgr01.shape
        x = x_bgr01 * 255.0 - jnp.asarray(_BGR_MEAN, self.dtype)
        scores = []
        for si, (widths, sname) in enumerate(zip(_STAGES, _STAGE_NAMES)):
            if si > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci, w in enumerate(widths):
                x = nn.Conv(w, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"netVgg{sname}_{ci}")(x)
                x = nn.relu(x)
            s = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"netScore{sname}")(x)
            # bilinear upsample to input size (align_corners=False semantics)
            s = jax.image.resize(s, (b, H, W, 1), method="bilinear")
            scores.append(s)
        cat = jnp.concatenate(scores, axis=-1)
        out = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      name="netCombine")(cat)
        return jax.nn.sigmoid(out)


def hed_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """ControlNet HED checkpoint ('moduleVggOne.0.weight' or 'netVggOne.0.weight'
    style) -> flax params."""
    tree: Dict[str, Any] = {}
    # conv positions inside each torch Sequential (conv, relu[, pool] interleaved)
    for key, w in sd.items():
        key = key.replace("module", "net")
        parts = key.split(".")
        leaf = parts[-1]
        w = np.asarray(w)
        name = parts[0]
        if name.startswith("netVgg"):
            sname = name[len("netVgg"):]
            seq_idx = int(parts[1])
            # stage>0 sequences start with MaxPool at index 0; convs at even offsets
            first = 1 if sname != "One" else 0
            ci = (seq_idx - first) // 2
            node = tree.setdefault(f"netVgg{sname}_{ci}", {})
        elif name.startswith("netScore"):
            node = tree.setdefault(name, {})
        elif name == "netCombine":
            node = tree.setdefault("netCombine", {})
        else:
            raise KeyError(f"unrecognized HED key {key}")
        if leaf == "weight":
            node["kernel"] = np.transpose(w, (2, 3, 1, 0))
        else:
            node["bias"] = w
    return tree


def hed_nms(x: jnp.ndarray, threshold: float, sigma: float) -> jnp.ndarray:
    """Scribble post-process (reference annotator/hed/__init__.py:117-132):
    Gaussian blur, keep directional ridge maxima (4 line-structuring dilations),
    binarize. x: (H, W) float in [0, 255]."""
    radius = max(1, int(round(3.0 * sigma)))
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-(t**2) / (2 * sigma * sigma))
    g = g / g.sum()
    xf = x.astype(jnp.float32)
    pad = [(radius, radius)]
    blurred = jax.vmap(lambda row: jnp.convolve(row, g, mode="same"))(xf)
    blurred = jax.vmap(lambda col: jnp.convolve(col, g, mode="same"), in_axes=1,
                       out_axes=1)(blurred)

    def dshift(m, dy, dx):
        return jnp.roll(m, (dy, dx), axis=(0, 1))

    dirs = (
        ((0, -1), (0, 1)),    # horizontal line
        ((-1, 0), (1, 0)),    # vertical
        ((-1, -1), (1, 1)),   # main diagonal
        ((-1, 1), (1, -1)),   # anti diagonal
    )
    y = jnp.zeros_like(blurred)
    for (d1, d2) in dirs:
        dil = jnp.maximum(blurred, jnp.maximum(dshift(blurred, *d1), dshift(blurred, *d2)))
        y = jnp.where(dil == blurred, blurred, y)
    return ((y > threshold) * 255).astype(jnp.uint8)


class HEDdetector:
    """__call__(uint8 RGB HWC) -> uint8 HW edge map, like the reference detector.

    Without a checkpoint the net is randomly initialized (shape-correct, hermetic);
    pass `params` imported via hed_params_from_torch for real edges."""

    def __init__(self, params: Optional[Dict[str, Any]] = None, rng_seed: int = 0):
        self.net = HEDNetwork()
        if params is None:
            # jit: eager flax init is thousands of host dispatches (~10 s);
            # compiled once, then served by the persistent compile cache
            params = jax.jit(self.net.init)(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, 64, 64, 3))
            )["params"]
        self.params = params
        self._jit = jax.jit(
            lambda p, x: self.net.apply({"params": p}, x)
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "HEDdetector":
        from controllora_tpu.utils.torch_compat import load_state_dict

        return cls(hed_params_from_torch(load_state_dict(path)))

    def __call__(self, input_image: np.ndarray) -> np.ndarray:
        assert input_image.ndim == 3
        bgr = input_image[:, :, ::-1].astype(np.float32) / 255.0
        edge = self._jit(self.params, jnp.asarray(bgr)[None])
        return np.asarray(
            jnp.clip(edge[0, :, :, 0] * 255.0, 0, 255).astype(jnp.uint8)
        )


def nms(x: np.ndarray, t: float, s: float) -> np.ndarray:
    """Reference-API wrapper over hed_nms (annotator/hed/__init__.py:117)."""
    return np.asarray(hed_nms(jnp.asarray(x, jnp.float32), t, s))
