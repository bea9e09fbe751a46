"""Annotator image utilities — on-device equivalents of reference annotator/util.py.

`HWC3` (gray/alpha -> RGB, reference annotator/util.py:9-25) and `resize_image`
(short side -> resolution, round to x64 multiples, reference annotator/util.py:28-38).
Resize runs as an XLA kernel (jax.image.resize); cv2's LANCZOS4/AREA kernels are
approximated by lanczos3/linear with documented tolerance.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
import jax


def HWC3(x: np.ndarray) -> np.ndarray:
    """uint8 HW/HWC{1,3,4} -> HWC3 (alpha composited over white, like the reference)."""
    if x.ndim == 2:
        x = x[:, :, None]
    if x.shape[2] == 1:
        return np.repeat(x, 3, axis=2)
    if x.shape[2] == 3:
        return x
    if x.shape[2] == 4:
        color = x[:, :, :3].astype(np.float32)
        alpha = x[:, :, 3:].astype(np.float32) / 255.0
        y = color * alpha + 255.0 * (1.0 - alpha)
        return y.clip(0, 255).astype(np.uint8)
    raise ValueError(f"bad channel count {x.shape}")


def resize_image(image: np.ndarray, resolution: int) -> np.ndarray:
    """Scale so the short side == resolution, round H/W up to multiples of 64
    (reference annotator/util.py:28-38)."""
    h, w = image.shape[:2]
    k = resolution / min(h, w)
    H = int(math.ceil(h * k / 64.0)) * 64
    W = int(math.ceil(w * k / 64.0)) * 64
    method = "lanczos3" if k > 1 else "linear"
    out = jax.image.resize(
        jnp.asarray(image, jnp.float32), (H, W, image.shape[2]), method=method
    )
    return np.asarray(jnp.clip(jnp.round(out), 0, 255), np.uint8)
