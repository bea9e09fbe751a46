"""Process-dataset zoo tests (hermetic: procedural fallbacks, local jsonl layouts)."""

import json
import os

import numpy as np
import pytest

from controllora_tpu.data import (
    DanbooruSketch,
    DatasetBase,
    DiffusionDBCanny,
    DreamBoothDataset,
    Fill50kSynthetic,
    MPIIPose,
)


def test_registry_complete():
    for name in ("fill50k", "diffusiondb_canny", "mpii_pose", "danbooru_sketch",
                 "dreambooth"):
        assert f"process/{name}" in DatasetBase._registry


def test_diffusiondb_canny_hermetic():
    ds = DiffusionDBCanny(resolution=96, size=5, seed=3)
    it = ds[1]
    assert it["pixel_values"].shape == (96, 96, 3)
    assert it["guide_values"].shape == (96, 96, 3)
    # guide is binary-ish edges normalized to [-1, 1]
    vals = np.unique(np.round(it["guide_values"], 3))
    assert set(vals.tolist()) <= {-1.0, 1.0}
    # deterministic per index (random thresholds are seeded)
    np.testing.assert_allclose(ds[1]["guide_values"], it["guide_values"])
    # different indices draw different thresholds/images
    assert np.abs(ds[2]["pixel_values"] - it["pixel_values"]).max() > 0.1


def _make_jsonl_ds(tmp_path, cls, guide_dirs=("guides",)):
    from PIL import Image

    root = tmp_path / "data"
    os.makedirs(root / "images")
    for d in guide_dirs:
        os.makedirs(root / d)
    recs = []
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (80, 100, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i}.png")
        for d in guide_dirs:
            Image.fromarray(255 - img).save(root / d / f"{i}.png")
        recs.append({"image": f"images/{i}.png", "guide": f"{guide_dirs[0]}/{i}.png",
                     "text": f"caption {i}"})
    with open(root / "prompt.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    return str(root)


def test_mpii_pose_local(tmp_path):
    root = _make_jsonl_ds(tmp_path, MPIIPose)
    ds = MPIIPose(resolution=64, data_root=root)
    assert len(ds) == 4
    it = ds[0]
    assert it["pixel_values"].shape == (64, 64, 3)
    assert it["guide_values"].shape == (64, 64, 3)
    # synchronized crop: guide == inverse of image at every pixel
    a = (it["pixel_values"] + 1) * 127.5
    b = (it["guide_values"] + 1) * 127.5
    np.testing.assert_allclose(np.round(a + b), 255, atol=2)


def test_danbooru_sketch_styles(tmp_path):
    root = _make_jsonl_ds(tmp_path, DanbooruSketch,
                          guide_dirs=("sketch_a", "sketch_b", "sketch_c"))
    ds = DanbooruSketch(resolution=64, data_root=root)
    it = ds[0]
    assert it["guide_values"].shape == (64, 64, 3)


def test_missing_jsonl_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        MPIIPose(resolution=64, data_root=str(tmp_path / "nope"))


def test_dreambooth_dataset(tmp_path):
    from PIL import Image

    d = tmp_path / "inst"
    os.makedirs(d)
    for i in range(2):
        Image.fromarray(np.zeros((90, 70, 3), np.uint8)).save(d / f"{i}.png")
    ds = DreamBoothDataset(instance_data_dir=str(d), instance_prompt="a sks thing",
                           resolution=64)
    it = ds[0]
    assert it["pixel_values"].shape == (64, 64, 3)
    assert it["input_ids"].shape == (77,)
