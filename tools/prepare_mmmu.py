"""Extract MMMU val parquet shards into images/ + mmmu_val.jsonl.

Raw-data preparation counterpart of evaluations/mmmu/load_mmmu.py's inline
parquet handling — kept in tools/ so evaluation/loaders.py::load_mmmu stays a
pure reader. Usage:

  python tools/prepare_mmmu.py --mmmu-dir /data/MMMU --out /data/eval/mmmu
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from leopard_tpu.evaluation.metrics import option_block  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mmmu-dir", required=True, help="dir with */val*.parquet")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    try:
        import pyarrow.parquet as pq
    except ImportError:
        raise SystemExit("pyarrow is required to extract MMMU parquet shards")

    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)
    rows = []
    for f in sorted(glob.glob(os.path.join(args.mmmu_dir, "*", "val*.parquet"))):
        for exp in pq.read_table(f).to_pandas().to_dict("records"):
            qid = exp["id"]
            question = exp["question"]
            options = eval(exp["options"])  # the raw format stores a py-list str
            concat = option_block(options)
            images = []
            probe = f"{question} {concat}"
            for i in range(7):
                img = exp.get(f"image_{i + 1}")
                if img is not None and f"<image {i + 1}>" in probe:
                    name = f"images/{qid}_{i}.png"
                    with open(os.path.join(args.out, name), "wb") as fh:
                        fh.write(img["bytes"])
                    images.append(name)
            for i in range(7):
                question = question.replace(f"<image {i + 1}>", "<image>")
                concat = concat.replace(f"<image {i + 1}>", "<image>")
            if exp["question_type"] == "multiple-choice":
                query = f"{question}\nChoices:\n{concat}"
            else:
                query = question
            rows.append({
                "images_path": images,
                "question": query,
                "options": options,
                "answers": exp["answer"],
                "ques_type": exp["question_type"],
            })
    with open(os.path.join(args.out, "mmmu_val.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"prepared {len(rows)} samples → {args.out}/mmmu_val.jsonl")


if __name__ == "__main__":
    main()
