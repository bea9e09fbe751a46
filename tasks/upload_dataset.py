#!/usr/bin/env python
"""Push a locally-built dataset directory to the HF hub — reference
tasks/upload_dataset_*.py equivalent. Requires network + HF token."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--repo_id", required=True)
    args = p.parse_args()

    from datasets import Dataset, Image as HFImage

    with open(os.path.join(args.data_dir, "prompt.jsonl")) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    ds = Dataset.from_dict({
        "image": [os.path.join(args.data_dir, r["image"]) for r in recs],
        "guide": [os.path.join(args.data_dir, r["guide"]) for r in recs],
        "text": [r["text"] for r in recs],
    }).cast_column("image", HFImage()).cast_column("guide", HFImage())
    ds.push_to_hub(args.repo_id)
    print(f"pushed {len(ds)} rows to {args.repo_id}")


if __name__ == "__main__":
    main()
