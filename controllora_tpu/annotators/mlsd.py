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


DEFAULT_SQUARE_PARAMS = {
    "score": 0.06,
    "outside_ratio": 0.28,
    "inside_ratio": 0.45,
    "w_overlap": 0.0,
    "w_degree": 1.95,
    "w_length": 0.0,
    "w_area": 1.86,
    "w_center": 0.14,
}


def _maxfilter5(a: np.ndarray) -> np.ndarray:
    """5x5 max filter, SAME padding (the reference's F.max_pool2d NMS on the hough
    accumulator, utils.py:180-183)."""
    p = np.pad(a, 2, constant_values=-np.inf)
    out = np.full_like(a, -np.inf)
    for dy in range(5):
        for dx in range(5):
            np.maximum(out, p[dy : dy + a.shape[0], dx : dx + a.shape[1]], out)
    return out


def squares_from_segments(
    segments: np.ndarray,
    topk_len: int,
    params: Dict[str, float],
    input_shape=(512, 512),
    original_shape=None,
):
    """Square/quad detection from decoded line segments — the post-processing half of
    the reference's pred_squares (reference annotator/mlsd/utils.py:137-580), factored
    out so it is testable on synthetic scenes without trained weights.

    segments: (N, 4) [x0,y0,x1,y1] in the model's half-resolution (256) frame.
    Returns (merged_segments, squares, scores, inter_points) in original-image coords
    (squares sorted by score, descending).
    """
    original_shape = original_shape or input_shape
    empty = (np.zeros((0, 4), np.float32), np.zeros((0, 4, 2), np.float32),
             np.zeros((0,), np.float32), np.zeros((0, 2), np.float32))
    if len(segments) == 0:
        return empty
    segments = np.asarray(segments, np.float64)

    # ---- 1. merge near-collinear segments on a quantized hough grid (utils.py:139-227)
    start, end = segments[:, :2], segments[:, 2:]
    diff = start - end
    a = diff[:, 1]
    b = -diff[:, 0]
    c = a * start[:, 0] + b * start[:, 1]
    d = np.abs(-c) / np.sqrt(a**2 + b**2 + 1e-10)  # distance of line to (0,0)
    theta = np.arctan2(diff[:, 0], diff[:, 1]) * 180 / np.pi
    theta[theta < 0.0] += 180

    dq = np.floor(d).astype(np.int64)  # d_quant=1
    tq = np.floor(theta / 2).astype(np.int64)  # theta_quant=2
    acc_map = np.zeros((512 + 1, 180 + 1), np.float32)
    idx_map = np.full((512 + 1, 180 + 1), -1, np.int32)
    cells: Dict[Tuple[int, int], list] = {}
    for si in range(len(segments)):
        cell = (int(dq[si]), int(tq[si]))
        if cell[0] > 512 or cell[1] > 180:
            continue
        cells.setdefault(cell, []).append(si)
    for cell, idxs in cells.items():
        acc_map[cell] = len(idxs)
        idx_map[cell] = min(idxs)  # np.unique keeps the first occurrence

    nms = acc_map * (acc_map == _maxfilter5(acc_map))
    flat = nms.reshape(-1)
    k = min(topk_len, flat.size)
    order = np.argsort(flat)[::-1][:k]
    W = acc_map.shape[1]

    merged_segments = []
    for fi in order:
        y, x = int(fi) // W, int(fi) % W
        max_indice = idx_map[y, x]
        if max_indice == -1 or flat[fi] == 0:
            continue
        group = []
        for yo in range(-2, 3):
            for xo in range(-2, 3):
                yy, xx = y + yo, x + xo
                if 0 <= yy < acc_map.shape[0] and 0 <= xx < acc_map.shape[1]:
                    group.extend(cells.get((yy, xx), []))
        pts = segments[group].reshape(-1, 2)
        srt = np.sort(pts, axis=0)
        x_min, y_min = srt[0]
        x_max, y_max = srt[-1]
        if theta[max_indice] >= 90:
            merged_segments.append([x_min, y_max, x_max, y_min])
        else:
            merged_segments.append([x_min, y_min, x_max, y_max])
    if len(merged_segments) < 4:
        return empty

    # ---- 2. pairwise line intersections (utils.py:229-248)
    new_segments = np.asarray(merged_segments, np.float64)
    start, end = new_segments[:, :2], new_segments[:, 2:]
    new_centers = (start + end) / 2.0
    diff = start - end
    dist_segments = np.sqrt(np.sum(diff**2, axis=-1))
    a = diff[:, 1]
    b = -diff[:, 0]
    c = a * start[:, 0] + b * start[:, 1]
    pre_det = a[:, None] * b[None, :]
    det = pre_det - pre_det.T
    pre_iy = a[:, None] * c[None, :]
    inter_y = (pre_iy - pre_iy.T) / (det + 1e-10)
    pre_ix = c[:, None] * b[None, :]
    inter_x = (pre_ix - pre_ix.T) / (det + 1e-10)
    # near-parallel pairs intersect at ~inf; clip to a finite sentinel before the int
    # cast (the distance checks below reject them regardless)
    inter_pts = np.stack([inter_x, inter_y], axis=-1)
    inter_pts = np.clip(np.nan_to_num(inter_pts, posinf=1e9, neginf=-1e9),
                        -2**31 + 1, 2**31 - 1).astype(np.int32)

    # ---- 3. corner classification (utils.py:250-352)
    d1s = np.sqrt(np.sum((inter_pts - start[:, None, :]) ** 2, -1, keepdims=True))
    d1e = np.sqrt(np.sum((inter_pts - end[:, None, :]) ** 2, -1, keepdims=True))
    d2s = np.sqrt(np.sum((inter_pts - start[None, :, :]) ** 2, -1, keepdims=True))
    d2e = np.sqrt(np.sum((inter_pts - end[None, :, :]) ** 2, -1, keepdims=True))
    dist1 = np.sort(np.concatenate([d1s, d1e], -1), -1)  # (N, N, 2)
    dist2 = np.sort(np.concatenate([d2s, d2e], -1), -1)

    v1 = new_centers[:, None, :] - inter_pts
    deg1 = np.arctan2(v1[:, :, 1], v1[:, :, 0]) * 180 / np.pi
    deg1[deg1 < 0] += 360
    v2 = new_centers[None, :, :] - inter_pts
    deg2 = np.arctan2(v2[:, :, 1], v2[:, :, 0]) * 180 / np.pi
    deg2[deg2 < 0] += 360
    deg_sort = np.sort(np.stack([deg1, deg2], -1), -1)
    deg_diff = np.abs(deg1 - deg2)
    deg_diff[deg_diff > 180] = 360 - deg_diff[deg_diff > 180]

    o_r, i_r = params["outside_ratio"], params["inside_ratio"]
    corner_dict: Dict[int, list] = {ci: [] for ci in range(4)}
    inter_points = []
    n = len(new_segments)
    for i in range(n):
        for j in range(i + 1, n):
            if not (60 < deg_diff[i, j] < 120):
                continue
            ok1 = (dist1[i, j, 1] >= dist_segments[i]
                   and dist1[i, j, 0] <= dist_segments[i] * o_r) or (
                dist1[i, j, 1] <= dist_segments[i]
                and dist1[i, j, 0] <= dist_segments[i] * i_r)
            ok2 = (dist2[i, j, 1] >= dist_segments[j]
                   and dist2[i, j, 0] <= dist_segments[j] * o_r) or (
                dist2[i, j, 1] <= dist_segments[j]
                and dist2[i, j, 0] <= dist_segments[j] * i_r)
            if not (ok1 and ok2):
                continue
            x, y = inter_pts[i, j]
            da, db = deg_sort[i, j]
            if (0 <= da <= 45 and 45 <= db <= 120) or (db >= 315 and 45 <= da <= 120):
                ci = 0
            elif 45 <= da <= 125 and 125 <= db <= 225:
                ci = 1
            elif 125 <= da <= 225 and 225 <= db <= 315:
                ci = 2
            elif (0 <= da <= 45 and 225 <= db <= 315) or (db >= 315 and 225 <= da <= 315):
                ci = 3
            else:
                continue
            corner_dict[ci].append([int(x), int(y), i, j])
            inter_points.append([int(x), int(y)])

    # ---- 4. assemble squares from corners sharing lines (utils.py:354-404)
    square_list, connect_list, segments_list = [], [], []
    for c0 in corner_dict[0]:
        for c1 in corner_dict[1]:
            l01 = next((l for l in c0[2:] if l in c1[2:]), None)
            if l01 is None:
                continue
            for c2 in corner_dict[2]:
                l12 = next((l for l in c1[2:] if l in c2[2:]), None)
                if l12 is None:
                    continue
                for c3 in corner_dict[3]:
                    l23 = next((l for l in c2[2:] if l in c3[2:]), None)
                    if l23 is None:
                        continue
                    for l30 in c3[2:]:
                        if l30 in c0[2:]:
                            square_list.append(c0[:2] + c1[:2] + c2[:2] + c3[:2])
                            connect_list.append([l01, l12, l23, l30])
                            segments_list.append(c0[2:] + c1[2:] + c2[2:] + c3[2:])

    def rescale_segs(segs):
        segs = np.asarray(segs, np.float32)
        if len(segs):
            segs[:, 0::2] *= 2 / input_shape[1] * original_shape[1]
            segs[:, 1::2] *= 2 / input_shape[0] * original_shape[0]
        return segs

    ipts = np.asarray(inter_points, np.float32).reshape(-1, 2)
    if len(ipts):
        ipts[:, 0] *= 2 / input_shape[1] * original_shape[1]
        ipts[:, 1] *= 2 / input_shape[0] * original_shape[0]
    if not square_list:
        return (rescale_segs(new_segments), np.zeros((0, 4, 2), np.float32),
                np.zeros((0,), np.float32), ipts)

    # ---- 5. score + rank squares (utils.py:421-549)
    map_size = input_shape[0] / 2
    squares = np.asarray(square_list, np.float64).reshape(-1, 4, 2)
    connect_array = np.asarray(connect_list)
    segments_array = np.asarray(segments_list).reshape(-1, 4, 2)

    vec1 = np.roll(squares, 1, axis=1) - squares
    vec1 /= np.linalg.norm(vec1, axis=-1, keepdims=True) + 1e-10
    vec2 = np.roll(squares, -1, axis=1) - squares
    vec2 /= np.linalg.norm(vec2, axis=-1, keepdims=True) + 1e-10
    sq_degree = np.arccos(np.clip(np.sum(vec1 * vec2, -1), -1, 1)) * 180 / np.pi

    def check_outside_inside(seg_info, connect_idx):
        mat = dist1 if connect_idx == seg_info[0] else dist2
        i, j = seg_info
        min_d, max_d = mat[i, j]
        if max_d > dist_segments[connect_idx]:
            return min_d, 0, 1  # outside: min_dist, cover_param, peri_param
        return min_d, -1, -1  # inside

    overlap_scores, degree_scores, length_scores = [], [], []
    for connects, segs, square, degree in zip(
        connect_array, segments_array, squares, sq_degree
    ):
        cover = perimeter = 0.0
        square_length = []
        for s_idx in range(4):
            e_idx = (s_idx + 1) % 4
            cidx = connects[s_idx]
            s_min, s_cov, s_per = check_outside_inside(segs[s_idx], cidx)
            e_min, e_cov, e_per = check_outside_inside(segs[e_idx], cidx)
            cover += dist_segments[cidx] + s_cov * s_min + e_cov * e_min
            peri = dist_segments[cidx] + s_per * s_min + e_per * e_min
            perimeter += peri
            square_length.append(peri)
        overlap_scores.append(cover / perimeter)
        d0, d1_, d2_, d3 = degree
        r1 = d0 / d2_ if d0 / d2_ <= 1.0 else d2_ / d0
        r2 = d1_ / d3 if d1_ / d3 <= 1.0 else d3 / d1_
        degree_scores.append((r1 + r2) / 2)
        l0, l1, l2, l3 = square_length
        lr1 = l0 / l2 if l2 > l0 else l2 / l0
        lr2 = l1 / l3 if l3 > l1 else l3 / l1
        length_scores.append((lr1 + lr2) / 2)

    overlap_scores = np.asarray(overlap_scores)
    overlap_scores /= np.max(overlap_scores)
    degree_scores = np.asarray(degree_scores)
    length_scores = np.asarray(length_scores)

    ax_, ay_ = squares[:, :, 0], squares[:, :, 1]
    correction = ax_[:, -1] * ay_[:, 0] - ay_[:, -1] * ax_[:, 0]
    area = np.sum(ax_[:, :-1] * ay_[:, 1:], -1) - np.sum(ay_[:, :-1] * ax_[:, 1:], -1)
    area_scores = 0.5 * np.abs(area + correction) / (map_size * map_size)

    # reference quirk preserved: center2center is a SCALAR (np.sum without axis,
    # utils.py:532) — a constant shift that cannot change the ranking
    centers = np.array([[map_size / 2, map_size / 2]], np.float64)
    center2center = np.sqrt(np.sum((centers - np.mean(squares, axis=1)) ** 2))
    center_scores = center2center / (map_size / np.sqrt(2.0))

    score_array = (
        params["w_overlap"] * overlap_scores
        + params["w_degree"] * degree_scores
        + params["w_area"] * area_scores
        - params["w_center"] * center_scores
        + params["w_length"] * length_scores
    )
    order = np.argsort(score_array)[::-1]
    score_array = score_array[order]
    squares = squares[order].astype(np.float32)
    squares[:, :, 0] *= 2 / input_shape[1] * original_shape[1]
    squares[:, :, 1] *= 2 / input_shape[0] * original_shape[0]
    return (rescale_segs(new_segments), squares,
            score_array.astype(np.float32), ipts)


def pred_squares(
    image: np.ndarray,
    apply_fn,
    params,
    input_shape=(512, 512),
    square_params: Optional[Dict[str, float]] = None,
):
    """Square/quad detection — reference pred_squares (utils.py:89-580): on-device
    junction decode + host-side hough merge / intersection / corner assembly."""
    square_params = square_params or DEFAULT_SQUARE_PARAMS
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
        if s > square_params["score"] and float(np.hypot(d[2] - d[0], d[3] - d[1])) > 20.0:
            segs.append([x + d[0], y + d[1], x + d[2], y + d[3]])
    return squares_from_segments(
        np.asarray(segs, np.float32).reshape(-1, 4), len(scores), square_params,
        input_shape, (h, w),
    )


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
            # jit: eager flax init is thousands of host dispatches (~10 s);
            # compiled once, then served by the persistent compile cache
            params = jax.jit(self.model.init)(
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
