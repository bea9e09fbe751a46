"""Annotator kernel tests — XLA Canny vs OpenCV ground truth with documented tolerance
(hysteresis connectivity is reformulated as iterated dilation, SURVEY.md §7)."""

import numpy as np
import pytest

from controllora_tpu.annotators import CannyDetector, HWC3, resize_image

cv2 = pytest.importorskip("cv2")


def synth_image(seed=0, size=128):
    """Smooth synthetic scene: gradient background + shapes."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    img = 128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
    cx, cy, r = size // 2, size // 2, size // 4
    mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r * r
    img[mask] = 220.0
    img[10 : size // 3, 10 : size // 3] = 40.0
    img = np.clip(img + rng.normal(0, 2, img.shape), 0, 255).astype(np.uint8)
    return np.repeat(img[:, :, None], 3, axis=2)


def f1_score(a: np.ndarray, b: np.ndarray) -> float:
    a, b = a > 0, b > 0
    tp = (a & b).sum()
    if a.sum() == 0 or b.sum() == 0:
        return 0.0
    p, r = tp / max(a.sum(), 1), tp / max(b.sum(), 1)
    return 2 * p * r / max(p + r, 1e-9)


def tolerant_f1(ours: np.ndarray, ref: np.ndarray, tol_px: int = 1) -> float:
    """F1 where a predicted edge within tol_px of a reference edge counts as a hit —
    standard edge-benchmark practice (exact pixel layouts differ across impls)."""
    kernel = np.ones((2 * tol_px + 1, 2 * tol_px + 1), np.uint8)
    ref_d = cv2.dilate((ref > 0).astype(np.uint8), kernel)
    ours_d = cv2.dilate((ours > 0).astype(np.uint8), kernel)
    tp_p = ((ours > 0) & (ref_d > 0)).sum()
    tp_r = ((ref > 0) & (ours_d > 0)).sum()
    p = tp_p / max((ours > 0).sum(), 1)
    r = tp_r / max((ref > 0).sum(), 1)
    return 2 * p * r / max(p + r, 1e-9)


@pytest.mark.parametrize("lo,hi", [(50, 150), (100, 200), (30, 80)])
def test_canny_matches_cv2(lo, hi):
    img = synth_image()
    ours = CannyDetector()(img, lo, hi)
    ref = cv2.Canny(img, lo, hi)
    assert ours.shape == ref.shape
    score = tolerant_f1(ours, ref, tol_px=1)
    assert score > 0.82, f"tolerant F1 {score:.3f} too low (lo={lo}, hi={hi})"


def test_canny_threshold_monotonic():
    img = synth_image(1)
    det = CannyDetector()
    few = det(img, 150, 250)
    many = det(img, 20, 60)
    assert (many > 0).sum() > (few > 0).sum()


def test_canny_blank_image():
    det = CannyDetector()
    out = det(np.full((64, 64, 3), 128, np.uint8), 50, 150)
    assert (out > 0).sum() == 0


def test_hwc3():
    gray = np.zeros((8, 8), np.uint8)
    assert HWC3(gray).shape == (8, 8, 3)
    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[:, :, 3] = 0  # fully transparent -> white
    assert (HWC3(rgba) == 255).all()
    rgb = np.zeros((8, 8, 3), np.uint8)
    assert HWC3(rgb) is rgb


def test_resize_image_multiple_of_64():
    img = np.zeros((100, 160, 3), np.uint8)
    out = resize_image(img, 128)
    assert out.shape[0] % 64 == 0 and out.shape[1] % 64 == 0
    assert min(out.shape[:2]) >= 128
