"""Native data-plane tests (C extension build, correctness vs python reference)."""

import numpy as np
import pytest

from controllora_tpu.data import Fill50kSynthetic
from controllora_tpu.data.fastloader import (
    NativeFill50kBatcher,
    Prefetcher,
    fill50k_batch_native,
    native_available,
    normalize_u8_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="C toolchain unavailable"
)


def test_normalize_exact():
    u8 = np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    out = normalize_u8_native(u8)
    np.testing.assert_allclose(out, u8.astype(np.float32) / 127.5 - 1.0, atol=1e-6)


def test_fill50k_matches_python():
    ds = Fill50kSynthetic(resolution=128, size=10, seed=2)
    from controllora_tpu.data.fill50k import _COLORS

    for i in range(3):
        bg, fg, cx, cy, radius = ds._sample_spec(i)
        spec = np.array([[cx, cy, radius, *_COLORS[bg], *_COLORS[fg]]], np.float32)
        px, gd = fill50k_batch_native(spec, 128, nthreads=2)
        ref = ds[i]
        # interiors match exactly; anti-aliased edge ring differs by < a few pixels
        assert np.abs(px[0] - ref["pixel_values"]).mean() < 5e-3
        # guides: same ring support
        agree = (gd[0] > 0) == (ref["guide_values"] > 0)
        assert agree.mean() > 0.995


def test_batcher_and_prefetcher():
    ds = Fill50kSynthetic(resolution=64, size=50)
    it = iter(NativeFill50kBatcher(ds, 4, nthreads=2))
    b = next(it)
    assert b["pixel_values"].shape == (4, 64, 64, 3)
    assert b["guide_values"].shape == (4, 64, 64, 3)
    assert b["input_ids"].shape == (4, 77)
    pf = Prefetcher(iter(NativeFill50kBatcher(ds, 4, nthreads=2)), depth=2)
    assert next(pf)["pixel_values"].shape == (4, 64, 64, 3)
