#!/usr/bin/env python
"""Build the fill50k dataset on disk — reference tasks/make_dataset_fill50k.py
equivalent (the reference converts ControlNet's zip to an HF dataset with
(image, guide, text) columns; here the circles are synthesized procedurally and saved
as an HF `datasets` arrow dataset + a browsable imagefolder)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/fill50k")
    p.add_argument("--num", type=int, default=50_000)
    p.add_argument("--resolution", type=int, default=512)
    args = p.parse_args()

    from PIL import Image

    from controllora_tpu.data import Fill50kSynthetic

    ds = Fill50kSynthetic(resolution=args.resolution, size=args.num)
    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "guides"), exist_ok=True)

    records = []
    for i in range(args.num):
        bg, fg, *_ = ds._sample_spec(i)
        item = ds[i]
        img = ((item["pixel_values"] + 1) * 127.5).astype(np.uint8)
        gd = ((item["guide_values"] + 1) * 127.5).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(args.out, "images", f"{i}.png"))
        Image.fromarray(gd).save(os.path.join(args.out, "guides", f"{i}.png"))
        records.append({
            "image": f"images/{i}.png",
            "guide": f"guides/{i}.png",
            "text": f"{fg} circle with {bg} background",
        })
        if (i + 1) % 1000 == 0:
            print(f"{i+1}/{args.num}")
    import json

    with open(os.path.join(args.out, "prompt.jsonl"), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {args.num} pairs to {args.out}")


if __name__ == "__main__":
    main()
