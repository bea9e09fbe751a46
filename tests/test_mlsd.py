"""MLSD tests: model shapes, checkpoint-naming import structure, decode on synthetic
center/displacement maps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.annotators.mlsd import (
    _IR_SETTING,
    MLSDdetector,
    MobileV2MLSDLarge,
    decode_centers,
    mlsd_params_from_torch,
    pred_lines,
)


def test_model_shapes():
    m = MobileV2MLSDLarge()
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 4)))
    out = m.apply(p, jnp.zeros((1, 128, 128, 4)))
    assert out.shape == (1, 64, 64, 9)


def synth_torch_mlsd_sd():
    sd = {}

    def conv(key, cin, cout, k, groups=1, bias=False):
        sd[f"{key}.weight"] = np.zeros((cout, cin // groups, k, k), np.float32)
        if bias:
            sd[f"{key}.bias"] = np.zeros((cout,), np.float32)

    def bn(key, c):
        for leaf, shape in (("weight", (c,)), ("bias", (c,)), ("running_mean", (c,)),
                            ("running_var", (c,)), ("num_batches_tracked", ())):
            sd[f"{key}.{leaf}"] = np.zeros(shape, np.float32)

    # features.0 = ConvBNReLU(4 -> 32, s2)
    conv("backbone.features.0.0", 4, 32, 3)
    bn("backbone.features.0.1", 32)
    cin = 32
    i = 1
    for t, c, n, s in _IR_SETTING:
        for j in range(n):
            hidden = cin * t
            base = f"backbone.features.{i}.conv"
            if t == 1:
                conv(f"{base}.0.0", hidden, hidden, 3, groups=hidden)
                bn(f"{base}.0.1", hidden)
                conv(f"{base}.1", hidden, c, 1)
                bn(f"{base}.2", c)
            else:
                conv(f"{base}.0.0", cin, hidden, 1)
                bn(f"{base}.0.1", hidden)
                conv(f"{base}.1.0", hidden, hidden, 3, groups=hidden)
                bn(f"{base}.1.1", hidden)
                conv(f"{base}.2", hidden, c, 1)
                bn(f"{base}.3", c)
            cin = c
            i += 1
    # head blocks: A(conv1=CBR on b, conv2=CBR on a), B(conv1, conv2), C
    for blk, (c1_in, c1_out, c2_in, c2_out) in {
        "block15": (96, 64, 64, 64),
        "block17": (64, 64, 32, 64),
        "block19": (64, 64, 24, 64),
        "block21": (64, 64, 16, 64),
    }.items():
        conv(f"{blk}.conv1.0", c1_in, c1_out, 1)
        bn(f"{blk}.conv1.1", c1_out)
        conv(f"{blk}.conv2.0", c2_in, c2_out, 1)
        bn(f"{blk}.conv2.1", c2_out)
    for blk in ("block16", "block18", "block20", "block22"):
        conv(f"{blk}.conv1.0", 128, 128, 3)
        bn(f"{blk}.conv1.1", 128)
        conv(f"{blk}.conv2.0", 128, 64, 3)
        bn(f"{blk}.conv2.1", 64)
    conv("block23.conv1.0", 64, 64, 3)
    bn("block23.conv1.1", 64)
    conv("block23.conv2.0", 64, 64, 3)
    bn("block23.conv2.1", 64)
    conv("block23.conv3", 64, 16, 1, bias=True)
    return sd


def tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v).shape
    return out


def test_weight_import_structure():
    m = MobileV2MLSDLarge()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)))["params"]
    imported = mlsd_params_from_torch(synth_torch_mlsd_sd())
    pa, pb = tree_paths(imported), tree_paths(params)
    assert set(pa) == set(pb), (
        f"missing {sorted(set(pb)-set(pa))[:4]} extra {sorted(set(pa)-set(pb))[:4]}"
    )
    for k in pa:
        assert pa[k] == pb[k], (k, pa[k], pb[k])


def test_decode_synthetic_line():
    """Plant one strong center with displacement -> exactly one segment recovered."""
    tp = np.full((1, 64, 64, 9), -10.0, np.float32)
    tp[0, 30, 20, 0] = 10.0  # strong center at (y=30, x=20)
    tp[0, 30, 20, 1:5] = [-15.0, -5.0, 15.0, 5.0]  # dx0 dy0 dx1 dy1

    def fake_apply(params, x):
        return jnp.asarray(tp)

    img = np.zeros((128, 128, 3), np.uint8)
    lines = pred_lines(img, fake_apply, None, input_shape=(128, 128),
                       score_thr=0.5, dist_thr=20.0)
    assert lines.shape == (1, 4)
    # center at feature (20,30) * 2 (feat->512 scale) * ratio(128/128)=... the decoder
    # multiplies by 2 then by img/input ratios
    x0, y0, x1, y1 = lines[0]
    assert abs((x0 + x1) / 2 - 2 * 20 * (128 / 128)) < 1e-3
    assert abs((y0 + y1) / 2 - 2 * 30) < 1e-3


def test_detector_end_to_end_random_weights():
    det = MLSDdetector()
    img = np.random.default_rng(0).integers(0, 255, (128, 160, 3)).astype(np.uint8)
    out = det(img, 0.05, 0.05)
    assert out.shape == (128, 160)
    assert out.dtype == np.uint8


# ---------------------------------------------------------------------- pred_squares


def _square_scene_segments():
    """Four sides of the square (60,60)-(180,180) in the 256 half-res frame, each side
    split into two collinear sub-segments (exercises the hough merge), plus two
    distractor segments that must not form a square."""
    segs = []
    # top (y=60) and bottom (y=180), split at x=120
    for y in (60, 180):
        segs.append([70, y, 120, y])
        segs.append([120, y, 170, y])
    # left (x=60) and right (x=180), split at y=120
    for x in (60, 180):
        segs.append([x, 70, x, 120])
        segs.append([x, 120, x, 170])
    # distractors: diagonal + short isolated line
    segs.append([10, 10, 40, 55])
    segs.append([200, 30, 240, 35])
    return np.asarray(segs, np.float32)


def test_squares_from_segments_synthetic_square():
    from controllora_tpu.annotators.mlsd import (
        DEFAULT_SQUARE_PARAMS,
        squares_from_segments,
    )

    merged, squares, scores, inter = squares_from_segments(
        _square_scene_segments(), 200, DEFAULT_SQUARE_PARAMS,
        input_shape=(512, 512), original_shape=(512, 512),
    )
    assert len(squares) >= 1
    assert len(scores) == len(squares)
    # scores sorted descending
    assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))
    # best square corners ~= the synthetic square's corners, x2 rescale (256->512)
    best = squares[0]
    expect = np.asarray([[120, 120], [360, 120], [360, 360], [120, 360]], np.float32)
    # corner order is 0>1>2>3 = TL,TR,BR,BL by construction of the corner classes
    np.testing.assert_allclose(best, expect, atol=8.0)
    # intersections include the 4 corners
    assert len(inter) >= 4
    # merged segments include the 4 full-length sides
    assert len(merged) >= 4


def test_squares_from_segments_empty_and_no_square():
    from controllora_tpu.annotators.mlsd import (
        DEFAULT_SQUARE_PARAMS,
        squares_from_segments,
    )

    merged, squares, scores, inter = squares_from_segments(
        np.zeros((0, 4), np.float32), 200, DEFAULT_SQUARE_PARAMS)
    assert len(merged) == len(squares) == len(scores) == len(inter) == 0
    # parallel lines only -> no intersections/corners -> no squares
    segs = np.asarray([[10, 50, 200, 50], [10, 100, 200, 100],
                       [10, 150, 200, 150], [10, 200, 200, 200]], np.float32)
    merged, squares, scores, inter = squares_from_segments(
        segs, 200, DEFAULT_SQUARE_PARAMS)
    assert len(squares) == 0


def test_pred_squares_end_to_end_random_weights():
    """API surface check: pred_squares runs the full decode path on a fake model."""
    import jax.numpy as jnp

    from controllora_tpu.annotators.mlsd import pred_squares

    def fake_apply(params, x):
        return jnp.zeros((1, 256, 256, 9), jnp.float32)

    img = np.zeros((512, 512, 3), np.uint8)
    merged, squares, scores, inter = pred_squares(img, fake_apply, None)
    assert squares.shape[1:] == (4, 2) or len(squares) == 0
