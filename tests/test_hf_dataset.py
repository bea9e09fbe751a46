"""HF-datasets adapter tests using an in-memory datasets.Dataset."""

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")

from controllora_tpu.data.hf_dataset import HFImageGuideDataset  # noqa: E402


def make_hf_ds(n=4, multi_caption=False):
    from PIL import Image

    rng = np.random.default_rng(0)
    imgs = [Image.fromarray(rng.integers(0, 255, (80, 100, 3)).astype(np.uint8))
            for _ in range(n)]
    guides = [Image.fromarray(255 - np.asarray(im)) for im in imgs]
    caps = [["a", "b"] if multi_caption else f"caption {i}" for i in range(n)]
    return datasets.Dataset.from_dict({"image": imgs, "guide": guides, "text": caps})


def test_default_column_mapping():
    ds = HFImageGuideDataset(dataset=make_hf_ds(), resolution=64)
    assert len(ds) == 4
    it = ds[0]
    assert it["pixel_values"].shape == (64, 64, 3)
    assert it["guide_values"].shape == (64, 64, 3)
    assert it["input_ids"].shape == (77,)
    # synchronized crop: guide = 255 - image everywhere
    a = (it["pixel_values"] + 1) * 127.5
    b = (it["guide_values"] + 1) * 127.5
    np.testing.assert_allclose(np.round(a + b), 255, atol=2)


def test_explicit_columns_and_multi_caption():
    ds = HFImageGuideDataset(
        dataset=make_hf_ds(multi_caption=True), resolution=64,
        image_column="image", guide_column="guide", caption_column="text",
    )
    it = ds[1]
    assert it["input_ids"].shape == (77,)


def test_bad_column_raises():
    with pytest.raises(ValueError):
        HFImageGuideDataset(dataset=make_hf_ds(), resolution=64, guide_column="nope")


def test_max_train_samples():
    ds = HFImageGuideDataset(dataset=make_hf_ds(), resolution=64, max_train_samples=2)
    assert len(ds) == 2


def test_native_normalize_batcher_matches_python_path():
    """The C batch-normalize data plane must yield exactly the python batcher's
    stream (values, order, resume fast-forward)."""
    from controllora_tpu.data.fastloader import NativeNormalizeBatcher, native_available
    from controllora_tpu.data.registry import batch_iterator

    if not native_available():
        pytest.skip("native loader unavailable")
    ds = HFImageGuideDataset(dataset=make_hf_ds(), resolution=64)
    py = batch_iterator(ds, 2, seed=5)
    nat = iter(NativeNormalizeBatcher(ds, 2, seed=5))
    for _ in range(3):
        want, got = next(py), next(nat)
        for k in want:
            np.testing.assert_allclose(want[k], got[k], atol=1e-6)
    # fast-forward parity
    skipped = next(iter(NativeNormalizeBatcher(ds, 2, seed=5, start_step=3)))
    want = next(py)
    for k in want:
        np.testing.assert_allclose(want[k], skipped[k], atol=1e-6)
