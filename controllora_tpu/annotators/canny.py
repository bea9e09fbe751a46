"""Canny edge detector as fused XLA ops — the reference's cv2.Canny equivalent
(reference annotator/canny/__init__.py:4-6), the first kernel of the on-device
annotator zoo (BASELINE north star: Sobel + NMS + hysteresis on-device).

Algorithm matches cv2.Canny's conventions:
  * Sobel 3x3 with replicate border, L1 gradient magnitude (cv2 L2gradient=False),
  * multi-channel input: per-pixel gradient from the channel with max magnitude,
  * 4-sector non-maximum suppression with cv2's sector quantization
    (tan(22.5°)/tan(67.5°) boundaries),
  * double threshold + hysteresis via iterated masked dilation inside a
    `lax.while_loop` (XLA-friendly reformulation of BFS connectivity; SURVEY.md §7
    hard part 4).

Whole thing is one jit; batch with vmap for dataset preprocessing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_SOBEL_Y = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)

_TAN22 = 0.4142135623730951  # tan(pi/8)
_TAN67 = 2.414213562373095  # tan(3pi/8)


def _conv2(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 conv with replicate padding on (H, W, C)."""
    x = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    x = x.transpose(2, 0, 1)[:, None]  # (C,1,H,W)
    k = kernel[None, None]
    y = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID")
    return y[:, 0].transpose(1, 2, 0)


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift a 2D map, zero-filling edges."""
    return jnp.roll(x, (dy, dx), axis=(0, 1)) * _edge_mask(x.shape, dy, dx)


def _edge_mask(shape, dy, dx):
    h, w = shape
    m = jnp.ones(shape, jnp.float32)
    if dy > 0:
        m = m.at[:dy, :].set(0)
    elif dy < 0:
        m = m.at[dy:, :].set(0)
    if dx > 0:
        m = m.at[:, :dx].set(0)
    elif dx < 0:
        m = m.at[:, dx:].set(0)
    return m


@partial(jax.jit, static_argnames=("max_hysteresis_iters",))
def canny(
    image: jnp.ndarray,  # (H, W, C) float32 in [0, 255] or uint8
    low_threshold: jnp.ndarray,
    high_threshold: jnp.ndarray,
    max_hysteresis_iters: int = 64,
) -> jnp.ndarray:
    """Returns a (H, W) uint8 edge map (0/255)."""
    img = image.astype(jnp.float32)
    if img.ndim == 2:
        img = img[:, :, None]

    gx = _conv2(img, _SOBEL_X)
    gy = _conv2(img, _SOBEL_Y)
    mag_c = jnp.abs(gx) + jnp.abs(gy)  # L1, per channel
    cidx = jnp.argmax(mag_c, axis=-1, keepdims=True)
    gx = jnp.take_along_axis(gx, cidx, axis=-1)[:, :, 0]
    gy = jnp.take_along_axis(gy, cidx, axis=-1)[:, :, 0]
    mag = jnp.abs(gx) + jnp.abs(gy)

    # --- sector NMS (cv2 quantization)
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    horiz = ay <= _TAN22 * ax  # gradient ~ horizontal -> compare left/right
    vert = ay >= _TAN67 * ax  # gradient ~ vertical   -> compare up/down
    diag = ~(horiz | vert)
    same_sign = (gx * gy) >= 0  # diagonal direction selector

    m_l, m_r = _shift(mag, 0, 1), _shift(mag, 0, -1)
    m_u, m_d = _shift(mag, 1, 0), _shift(mag, -1, 0)
    m_ul, m_dr = _shift(mag, 1, 1), _shift(mag, -1, -1)
    m_ur, m_dl = _shift(mag, 1, -1), _shift(mag, -1, 1)

    keep_h = (mag > m_l) & (mag >= m_r)
    keep_v = (mag > m_u) & (mag >= m_d)
    keep_d1 = (mag > m_ul) & (mag >= m_dr)  # 135° (gx,gy same sign)
    keep_d2 = (mag > m_ur) & (mag >= m_dl)  # 45°
    keep = jnp.where(
        horiz, keep_h, jnp.where(vert, keep_v, jnp.where(same_sign, keep_d1, keep_d2))
    )
    nms = jnp.where(keep, mag, 0.0)

    strong = nms > high_threshold
    weak = nms > low_threshold

    # --- hysteresis: grow `strong` into `weak` by 8-neighborhood dilation to fixpoint
    def dilate(m):
        acc = m
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    acc = acc | (_shift(m.astype(jnp.float32), dy, dx) > 0)
        return acc

    def cond(carry):
        cur, changed, i = carry
        return changed & (i < max_hysteresis_iters)

    def body(carry):
        cur, _, i = carry
        new = (dilate(cur) & weak) | cur
        return new, jnp.any(new != cur), i + 1

    edges, _, _ = jax.lax.while_loop(cond, body, (strong, jnp.asarray(True), 0))
    return (edges * 255).astype(jnp.uint8)


class CannyDetector:
    """Drop-in for the reference's CannyDetector (annotator/canny/__init__.py)."""

    def __call__(self, img: np.ndarray, low_threshold, high_threshold) -> np.ndarray:
        out = canny(
            jnp.asarray(img), jnp.float32(low_threshold), jnp.float32(high_threshold)
        )
        return np.asarray(out)
