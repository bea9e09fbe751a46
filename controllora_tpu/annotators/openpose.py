"""OpenPose body/hand estimation — CMU CPM networks in JAX + pure-numpy PAF decode.

Capability-parity target: reference annotator/openpose/ (SURVEY.md §3.5):
  * `BodyposeModel` — VGG trunk + 6 two-branch CPM stages (38-ch PAFs, 19-ch heatmaps),
  * `HandposeModel` — single-branch 22-keypoint CPM,
  * `Body.__call__` decode: scale_search-averaged inference (default [0.5] — the
    reference's effective config; its commented [0.5,1,1.5,2] sweep is accepted
    too; boxsize 368, stride 8), Gaussian-smoothed 4-neighbor peak finding, PAF
    line-integral limb scoring with greedy bipartite assignment, person-subset
    assembly and pruning,
  * `draw_bodypose` / `draw_handpose` skeleton rasterization (numpy, no cv2).

The network + heatmap/PAF upsampling + Gaussian smoothing + peak masks run on-device
in one jit; the variable-size candidate assembly runs host-side in numpy (it is
data-dependent and tiny). Weights import from the CMU `body_pose_model.pth` /
`hand_pose_model.pth` naming (model0.conv1_1.weight, model2_1.Mconv1_stage2_L1.weight…).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------- blocks

_VGG_TRUNK = (
    ("conv1_1", 64), ("conv1_2", 64), ("pool",),
    ("conv2_1", 128), ("conv2_2", 128), ("pool",),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), ("pool",),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3_CPM", 256), ("conv4_4_CPM", 128),
)

_HAND_TRUNK = (
    ("conv1_1", 64), ("conv1_2", 64), ("pool",),
    ("conv2_1", 128), ("conv2_2", 128), ("pool",),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), ("pool",),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3_CPM", 128),
)


def _conv(x, feats, k, name, dtype, relu=True):
    y = nn.Conv(feats, (k, k), padding=((k // 2, k // 2), (k // 2, k // 2)),
                dtype=dtype, param_dtype=jnp.float32, name=name)(x)
    return nn.relu(y) if relu else y


class _Trunk(nn.Module):
    layout: tuple
    prefix: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for item in self.layout:
            if item[0] == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                name, feats = item
                x = _conv(x, feats, 3, f"{self.prefix}_{name}", self.dtype)
        return x


class _CPMStage(nn.Module):
    """7-conv refinement stage (Mconv1-5 7x7, Mconv6 1x1, Mconv7 1x1 -> out)."""

    out_ch: int
    prefix: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(1, 6):
            x = _conv(x, 128, 7, f"{self.prefix}_Mconv{i}", self.dtype)
        x = _conv(x, 128, 1, f"{self.prefix}_Mconv6", self.dtype)
        return _conv(x, self.out_ch, 1, f"{self.prefix}_Mconv7", self.dtype, relu=False)


class _CPMStage1(nn.Module):
    """First stage: 3x conv3 128 -> conv1 512 -> conv1 out."""

    out_ch: int
    prefix: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(1, 4):
            x = _conv(x, 128, 3, f"{self.prefix}_conv5_{i}_CPM", self.dtype)
        x = _conv(x, 512, 1, f"{self.prefix}_conv5_4_CPM", self.dtype)
        return _conv(x, self.out_ch, 1, f"{self.prefix}_conv5_5_CPM", self.dtype,
                     relu=False)


class BodyposeModel(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, H, W, 3) in [-0.5, 0.5] -> (paf (B,H/8,W/8,38), heatmap (B,H/8,W/8,19))."""
        feat = _Trunk(_VGG_TRUNK, "model0", self.dtype, name="model0")(x)
        l1 = _CPMStage1(38, "model1_1", self.dtype, name="model1_1")(feat)
        l2 = _CPMStage1(19, "model1_2", self.dtype, name="model1_2")(feat)
        for s in range(2, 7):
            cat = jnp.concatenate([l1, l2, feat], axis=-1)
            l1 = _CPMStage(38, f"model{s}_1", self.dtype, name=f"model{s}_1")(cat)
            l2 = _CPMStage(19, f"model{s}_2", self.dtype, name=f"model{s}_2")(cat)
        return l1, l2


class HandposeModel(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = _Trunk(_HAND_TRUNK, "model1_0", self.dtype, name="model1_0")(x)
        h = _conv(feat, 512, 1, "model1_1_conv6_1_CPM", self.dtype)
        out = _conv(h, 22, 1, "model1_1_conv6_2_CPM", self.dtype, relu=False)
        for s in range(2, 7):
            cat = jnp.concatenate([out, feat], axis=-1)
            out = _CPMStage(22, f"model{s}", self.dtype, name=f"model{s}")(cat)
        return out


# ---------------------------------------------------------------------------- weights


def openpose_params_from_torch(sd: Dict[str, np.ndarray], hand: bool = False):
    """CMU checkpoint naming -> flax params. Torch: 'model0.conv1_1.weight';
    flax here: params['model0']['model0_conv1_1']['kernel'] (module/prefix naming)."""
    tree: Dict[str, Any] = {}
    for key, w in sd.items():
        w = np.asarray(w)
        mod, layer, leaf = key.split(".")
        # strip relu prefix artifacts if present
        if layer.startswith("relu"):
            continue
        if hand and mod == "model1_1":
            flax_mod, flax_layer = None, f"model1_1_{layer}"
        elif mod.startswith("model") and "_" not in layer[:5] and not hand and mod in (
            "model1_1", "model1_2"
        ):
            flax_mod, flax_layer = mod, f"{mod}_{layer.replace(f'_{mod[-4:]}', '')}"
        else:
            flax_mod, flax_layer = mod, f"{mod}_{layer}"
        # normalize CPM stage layer names: torch 'conv5_1_CPM_L1' under model1_1 maps to
        # flax 'model1_1_conv5_1_CPM'; torch 'Mconv1_stage2_L1' under model2_1 ->
        # 'model2_1_Mconv1'
        if layer.startswith("Mconv"):
            flax_layer = f"{mod}_{layer.split('_')[0]}"
        elif layer.startswith("conv5_") and "CPM" in layer:
            flax_layer = f"{mod}_{'_'.join(layer.split('_')[:3])}"
        node_parent = tree.setdefault(flax_mod, {}) if flax_mod else tree
        node = node_parent.setdefault(flax_layer, {})
        if leaf == "weight":
            node["kernel"] = np.transpose(w, (2, 3, 1, 0))
        else:
            node["bias"] = w
    return tree


# ---------------------------------------------------------------------------- decode

# limb sequence and PAF channel pairs (0-indexed; the published CMU convention —
# reference body.py:99-105 uses 1-indexed limbSeq and mapIdx offset by 19)
LIMB_SEQ = [
    (1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8), (8, 9), (9, 10),
    (1, 11), (11, 12), (12, 13), (1, 0), (0, 14), (14, 16), (0, 15), (15, 17),
    (2, 16), (5, 17),
]
PAF_IDX = [
    (12, 13), (20, 21), (14, 15), (16, 17), (22, 23), (24, 25), (0, 1), (2, 3),
    (4, 5), (6, 7), (8, 9), (10, 11), (28, 29), (30, 31), (34, 35), (32, 33),
    (36, 37), (18, 19), (26, 27),
]


def _gaussian_blur_2d(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    radius = max(1, int(round(4.0 * sigma)))
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-(t**2) / (2 * sigma * sigma))
    g = g / g.sum()
    x = jax.vmap(lambda r: jnp.convolve(r, g, mode="same"))(x)
    return jax.vmap(lambda c: jnp.convolve(c, g, mode="same"), in_axes=1, out_axes=1)(x)


@jax.jit
def _peak_mask(heatmaps: jnp.ndarray, thre1: float = 0.1):
    """(H, W, 18) -> boolean local-maximum mask per part (4-neighbor, like the
    reference body.py:77-92), computed on the sigma-3 blurred maps."""
    def per_part(hm):
        b = _gaussian_blur_2d(hm, 3.0)
        left = jnp.zeros_like(b).at[1:, :].set(b[:-1, :])
        right = jnp.zeros_like(b).at[:-1, :].set(b[1:, :])
        up = jnp.zeros_like(b).at[:, 1:].set(b[:, :-1])
        down = jnp.zeros_like(b).at[:, :-1].set(b[:, 1:])
        return (b >= left) & (b >= right) & (b >= up) & (b >= down) & (b > thre1)

    return jax.vmap(per_part, in_axes=2, out_axes=2)(heatmaps)


def find_peaks(heatmaps: np.ndarray, thre1: float = 0.1):
    """-> per-part list of (x, y, score, global_id)."""
    mask = np.asarray(_peak_mask(jnp.asarray(heatmaps), thre1))
    all_peaks = []
    counter = 0
    for part in range(18):
        ys, xs = np.nonzero(mask[:, :, part])
        peaks = [
            (int(x), int(y), float(heatmaps[y, x, part]), counter + i)
            for i, (x, y) in enumerate(zip(xs, ys))
        ]
        counter += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def score_limbs(paf: np.ndarray, all_peaks, img_h: int, thre2: float = 0.05,
                mid_num: int = 10):
    """PAF line-integral scoring + greedy bipartite matching per limb
    (reference body.py:104-150)."""
    connections = []
    for k, ((pa, pb), (ca, cb)) in enumerate(zip(LIMB_SEQ, PAF_IDX)):
        candA, candB = all_peaks[pa], all_peaks[pb]
        if not candA or not candB:
            connections.append(np.zeros((0, 5)))
            continue
        cands = []
        for i, a in enumerate(candA):
            for j, b in enumerate(candB):
                vec = np.array([b[0] - a[0], b[1] - a[1]], np.float64)
                norm = max(1e-3, float(np.hypot(*vec)))
                u = vec / norm
                xs = np.round(np.linspace(a[0], b[0], mid_num)).astype(int)
                ys = np.round(np.linspace(a[1], b[1], mid_num)).astype(int)
                px = paf[ys, xs, ca]
                py = paf[ys, xs, cb]
                scores = px * u[0] + py * u[1]
                prior = min(0.5 * img_h / norm - 1, 0)
                total = scores.mean() + prior
                if (scores > thre2).sum() > 0.8 * mid_num and total > 0:
                    cands.append((i, j, total, total + a[2] + b[2]))
        cands.sort(key=lambda c: c[2], reverse=True)
        used_i, used_j = set(), set()
        rows = []
        for i, j, s, _ in cands:
            if i not in used_i and j not in used_j:
                rows.append([candA[i][3], candB[j][3], s, i, j])
                used_i.add(i)
                used_j.add(j)
                if len(rows) >= min(len(candA), len(candB)):
                    break
        connections.append(np.array(rows) if rows else np.zeros((0, 5)))
    return connections


def assemble_people(all_peaks, connections):
    """Greedy subset assembly + merge + prune (reference body.py:155-209).
    Returns (candidate (N,4) [x,y,score,id], subset (P,20))."""
    candidate = np.array(
        [p for part in all_peaks for p in part], np.float64
    ).reshape(-1, 4)
    subset = -np.ones((0, 20))
    for k, (pa, pb) in enumerate(LIMB_SEQ):
        conn = connections[k]
        if len(conn) == 0:
            continue
        for row in conn:
            ida, idb, score = row[0], row[1], row[2]
            hits = []
            for j in range(len(subset)):
                if subset[j][pa] == ida or subset[j][pb] == idb:
                    hits.append(j)
                    if len(hits) == 2:
                        break
            if len(hits) == 1:
                j = hits[0]
                if subset[j][pb] != idb:
                    subset[j][pb] = idb
                    subset[j][-1] += 1
                    subset[j][-2] += candidate[int(idb), 2] + score
            elif len(hits) == 2:
                j1, j2 = hits
                both = ((subset[j1] >= 0).astype(int) + (subset[j2] >= 0).astype(int))[:-2]
                if not (both == 2).any():
                    subset[j1][:-2] += subset[j2][:-2] + 1
                    subset[j1][-2:] += subset[j2][-2:]
                    subset[j1][-2] += score
                    subset = np.delete(subset, j2, 0)
                else:
                    subset[j1][pb] = idb
                    subset[j1][-1] += 1
                    subset[j1][-2] += candidate[int(idb), 2] + score
            elif k < 17:
                row20 = -np.ones(20)
                row20[pa] = ida
                row20[pb] = idb
                row20[-1] = 2
                row20[-2] = candidate[int(ida), 2] + candidate[int(idb), 2] + score
                subset = np.vstack([subset, row20])
    keep = [
        i for i in range(len(subset))
        if subset[i][-1] >= 4 and subset[i][-2] / subset[i][-1] >= 0.4
    ]
    return candidate, subset[keep]


# ---------------------------------------------------------------------------- drawing

_LIMB_COLORS = [
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
    (85, 255, 0), (0, 255, 0), (0, 255, 85), (0, 255, 170), (0, 255, 255),
    (0, 170, 255), (0, 85, 255), (0, 0, 255), (85, 0, 255), (170, 0, 255),
    (255, 0, 255), (255, 0, 170), (255, 0, 85),
]


def _draw_line(canvas: np.ndarray, p0, p1, color, width: int = 4):
    """Thick anti-alias-free line via dense sampling (cv2.line/ellipse equivalent)."""
    n = max(2, int(np.hypot(p1[0] - p0[0], p1[1] - p0[1])) * 2)
    xs = np.linspace(p0[0], p1[0], n)
    ys = np.linspace(p0[1], p1[1], n)
    h, w = canvas.shape[:2]
    r = width // 2
    for x, y in zip(xs, ys):
        x0, x1 = max(0, int(x) - r), min(w, int(x) + r + 1)
        y0, y1 = max(0, int(y) - r), min(h, int(y) + r + 1)
        canvas[y0:y1, x0:x1] = color


def draw_bodypose(canvas: np.ndarray, candidate: np.ndarray, subset: np.ndarray):
    """Skeleton render (reference annotator/openpose/util.py:37-72 behavior)."""
    for limb_i in range(17):
        pa, pb = LIMB_SEQ[limb_i]
        color = _LIMB_COLORS[limb_i % len(_LIMB_COLORS)]
        for person in subset:
            ia, ib = int(person[pa]), int(person[pb])
            if ia < 0 or ib < 0:
                continue
            a, b = candidate[ia], candidate[ib]
            _draw_line(canvas, a[:2], b[:2], color)
    for part in range(18):
        color = _LIMB_COLORS[part % len(_LIMB_COLORS)]
        for person in subset:
            idx = int(person[part])
            if idx < 0:
                continue
            x, y = candidate[idx][:2]
            _draw_line(canvas, (x, y), (x, y), color, width=8)
    return canvas


# ---------------------------------------------------------------------------- hands

_HAND_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 7), (7, 8), (0, 9),
    (9, 10), (10, 11), (11, 12), (0, 13), (13, 14), (14, 15), (15, 16), (0, 17),
    (17, 18), (18, 19), (19, 20),
]


def hand_detect(candidate: np.ndarray, subset: np.ndarray, img_shape) -> List[tuple]:
    """Hand boxes from arm keypoints (reference openpose/util.py:94-157):
    box center = wrist + 0.33·(wrist − elbow), side = 1.5·max(|wrist−elbow|,
    0.9·|elbow−shoulder|). Returns [(x, y, w, is_left)]."""
    H, W = img_shape[:2]
    out = []
    for person in subset.astype(int):
        for (si, ei, wi), is_left in (((5, 6, 7), True), ((2, 3, 4), False)):
            if (person[[si, ei, wi]] < 0).any():
                continue
            x1, y1 = candidate[person[si]][:2]
            x2, y2 = candidate[person[ei]][:2]
            x3, y3 = candidate[person[wi]][:2]
            x = x3 + 0.33 * (x3 - x2)
            y = y3 + 0.33 * (y3 - y2)
            width = 1.5 * max(
                math.hypot(x3 - x2, y3 - y2), 0.9 * math.hypot(x2 - x1, y2 - y1)
            )
            x -= width / 2
            y -= width / 2
            x, y = max(0.0, x), max(0.0, y)
            width = min(width, W - x, H - y)
            if width >= 20:
                out.append((int(x), int(y), int(width), is_left))
    return out


def decode_hand_peaks(heatmaps: np.ndarray, thre: float = 0.05) -> np.ndarray:
    """21 keypoints from hand heatmaps — the reference decode (hand.py:59-75):
    per channel, Gaussian-smooth (sigma 3, on-device), threshold into a binary mask,
    label 8-connected components, keep the component with the largest RAW-heatmap
    mass, and return the raw argmax inside it. [0, 0] when nothing clears ``thre``."""
    from scipy import ndimage

    peaks = []
    blurred = np.asarray(
        jax.vmap(lambda m: _gaussian_blur_2d(m, 3.0), in_axes=2, out_axes=2)(
            jnp.asarray(heatmaps[:, :, :21])
        )
    )
    eight = np.ones((3, 3), np.int32)  # skimage connectivity=2 semantics
    for part in range(21):
        raw = heatmaps[:, :, part]
        binary = blurred[:, :, part] > thre
        if not binary.any():
            peaks.append([0, 0])
            continue
        labels, n = ndimage.label(binary, structure=eight)
        sums = ndimage.sum_labels(raw, labels, index=np.arange(1, n + 1))
        best = int(np.argmax(sums)) + 1
        masked = np.where(labels == best, raw, 0.0)
        y, x = np.unravel_index(np.argmax(masked), masked.shape)
        peaks.append([int(x), int(y)])
    return np.array(peaks)


def draw_handpose(canvas: np.ndarray, all_hand_peaks) -> np.ndarray:
    """Hand skeleton render (reference openpose/util.py draw_handpose)."""
    for peaks in all_hand_peaks:
        for i, (e0, e1) in enumerate(_HAND_EDGES):
            p0, p1 = peaks[e0], peaks[e1]
            if (p0 == 0).all() or (p1 == 0).all():
                continue
            hue = int(i / len(_HAND_EDGES) * 255)
            _draw_line(canvas, p0, p1, (hue, 255 - hue, 128), width=2)
        for p in peaks:
            if not (p == 0).all():
                _draw_line(canvas, p, p, (0, 0, 255), width=4)
    return canvas


# ---------------------------------------------------------------------------- detector


def _pad_to_stride(img: np.ndarray, stride: int = 8, value: float = 128.0):
    h, w = img.shape[:2]
    ph = (stride - h % stride) % stride
    pw = (stride - w % stride) % stride
    out = np.pad(img, ((0, ph), (0, pw), (0, 0)), constant_values=value)
    return out, (ph, pw)


class OpenposeDetector:
    """__call__(uint8 BGR HWC, hand=False) -> (canvas uint8 HWC, dict) like the
    reference (annotator/openpose/__init__.py:93-121). Random weights unless params
    are imported (openpose_params_from_torch)."""

    def __init__(self, body_params: Optional[Any] = None,
                 hand_params: Optional[Any] = None, rng_seed: int = 0):
        self.body_model = BodyposeModel()
        if body_params is None:
            body_params = jax.jit(self.body_model.init)(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, 64, 64, 3))
            )["params"]
        self.body_params = body_params
        self.hand_model = HandposeModel()
        self.hand_params = hand_params
        self._body_jit = jax.jit(
            lambda p, x: self.body_model.apply({"params": p}, x)
        )

    def infer_maps(self, ori_img: np.ndarray, boxsize: int = 368, stride: int = 8,
                   scale_search=(0.5,)):
        """(paf, heatmap) at image resolution, averaged over `scale_search` like the
        reference body path (annotator/openpose/body.py:25-58). The reference's
        effective configuration is the single scale [0.5] (body.py:26), which stays
        the default; passing e.g. (0.5, 1.0, 1.5, 2.0) reproduces its commented
        full sweep. Each scale is one fixed compiled shape per image size."""
        H, W = ori_img.shape[:2]
        paf_acc = np.zeros((H, W, 38), np.float32)
        heat_acc = np.zeros((H, W, 19), np.float32)
        for s in scale_search:
            scale = s * boxsize / ori_img.shape[0]
            h = max(stride, int(round(ori_img.shape[0] * scale)))
            w = max(stride, int(round(ori_img.shape[1] * scale)))
            small = np.asarray(
                jax.image.resize(jnp.asarray(ori_img, jnp.float32), (h, w, 3), "bicubic")
            )
            padded, _ = _pad_to_stride(small, stride)
            inp = jnp.asarray(padded[None] / 256.0 - 0.5, jnp.float32)
            paf, heat = self._body_jit(self.body_params, inp)
            paf_acc += np.asarray(
                jax.image.resize(paf[0], (H, W, 38), "bicubic")) / len(scale_search)
            heat_acc += np.asarray(
                jax.image.resize(heat[0], (H, W, 19), "bicubic")) / len(scale_search)
        return paf_acc, heat_acc

    def infer_hand(self, crop: np.ndarray, boxsize: int = 368, stride: int = 8,
                   scale_search=(0.5, 1.0, 1.5, 2.0)):
        """Hand heatmaps at crop resolution, averaged over the reference's four
        inference scales (hand.py:26-58). Crops are square, so the scaled shapes are
        the FIXED set {round(s·368)}_s — four compiled shapes total regardless of
        crop size (TPU-friendly static shapes)."""
        assert self.hand_params is not None
        if not hasattr(self, "_hand_jit"):
            self._hand_jit = jax.jit(
                lambda p, x: self.hand_model.apply({"params": p}, x)
            )
        H, W = crop.shape[:2]
        acc = np.zeros((H, W, 22), np.float32)
        for s in scale_search:
            scale = s * boxsize / crop.shape[0]
            h = max(stride, int(round(crop.shape[0] * scale)))
            w = max(stride, int(round(crop.shape[1] * scale)))
            small = np.asarray(
                jax.image.resize(jnp.asarray(crop, jnp.float32), (h, w, 3), "bicubic")
            )
            padded, _ = _pad_to_stride(small, stride)
            inp = jnp.asarray(padded[None] / 256.0 - 0.5, jnp.float32)
            heat = self._hand_jit(self.hand_params, inp)
            acc += np.asarray(
                jax.image.resize(heat[0], (H, W, 22), "bicubic")
            ) / len(scale_search)
        return acc

    def __call__(self, ori_img: np.ndarray, hand: bool = False,
                 scale_search=(0.5,)):
        paf, heat = self.infer_maps(ori_img, scale_search=scale_search)
        peaks = find_peaks(heat[:, :, :18])
        conns = score_limbs(paf, peaks, ori_img.shape[0])
        candidate, subset = assemble_people(peaks, conns)
        canvas = np.zeros_like(ori_img)
        draw_bodypose(canvas, candidate, subset)
        pose = {
            "bodies": {"candidate": candidate.tolist(), "subset": subset.tolist()},
        }
        if hand and self.hand_params is not None:
            all_hand_peaks = []
            for x, y, w, is_left in hand_detect(candidate, subset, ori_img.shape):
                crop = ori_img[y : y + w, x : x + w]
                if not is_left:
                    crop = crop[:, ::-1]
                hm = self.infer_hand(np.ascontiguousarray(crop))
                pk = decode_hand_peaks(hm)
                if not is_left:
                    pk[:, 0] = np.where(pk.sum(1) > 0, w - 1 - pk[:, 0], 0)
                pk = np.where(pk > 0, pk + np.array([x, y]), 0)
                all_hand_peaks.append(pk)
            draw_handpose(canvas, all_hand_peaks)
            pose["hands"] = [p.tolist() for p in all_hand_peaks]
        return canvas, pose
