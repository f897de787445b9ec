"""Macroscopic-correlation statistic over a detection dataset.

Equivalent of the reference's visualization/mc_distribution.ipynb: for each
image, computes the mean pairwise position-relation magnitude between GT
boxes (the paper's evidence that box positions are correlated), and plots the
dataset-wide distribution.

    python tools/mc_distribution.py --coco-path data/coco --output mc.png
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--coco-path", default="data/coco")
    p.add_argument("--split", default="val2017")
    p.add_argument("--output", default="mc_distribution.png")
    p.add_argument("--max-images", type=int, default=5000)
    return p.parse_args()


def box_pair_relation(boxes_cxcywh: np.ndarray) -> np.ndarray:
    """box_rel_encoding (relation_transformer.py:481-490) in numpy."""
    xy, wh = boxes_cxcywh[:, :2], boxes_cxcywh[:, 2:]
    delta_xy = np.abs(xy[:, None] - xy[None, :])
    delta_xy = np.log(delta_xy / (wh[:, None] + 1e-5) + 1.0)
    delta_wh = np.log((wh[:, None] + 1e-5) / (wh[None, :] + 1e-5))
    return np.concatenate([delta_xy, delta_wh], -1)


def main():
    args = parse_args()
    from relation_detr_tpu.data.coco import CocoDetection

    dataset = CocoDetection(
        img_folder=os.path.join(args.coco_path, args.split),
        ann_file=os.path.join(
            args.coco_path, "annotations", f"instances_{args.split}.json"
        ),
    )
    mc_values = []
    for img_id in dataset.ids[: args.max_images]:
        info = dataset.images[img_id]
        boxes, _ = dataset._prepare(img_id, info["height"], info["width"])
        if len(boxes) < 2:
            continue
        cxcywh = np.stack(
            [
                (boxes[:, 0] + boxes[:, 2]) / 2 / info["width"],
                (boxes[:, 1] + boxes[:, 3]) / 2 / info["height"],
                (boxes[:, 2] - boxes[:, 0]) / info["width"],
                (boxes[:, 3] - boxes[:, 1]) / info["height"],
            ],
            -1,
        )
        rel = box_pair_relation(cxcywh)
        off_diag = ~np.eye(len(boxes), dtype=bool)
        mc_values.append(float(np.abs(rel[off_diag]).mean()))

    mc_values = np.asarray(mc_values)
    print(f"{len(mc_values)} images with >=2 boxes; "
          f"MC mean {mc_values.mean():.4f}  median {np.median(mc_values):.4f}  "
          f"p10 {np.percentile(mc_values, 10):.4f}  p90 {np.percentile(mc_values, 90):.4f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(6, 4))
    plt.hist(mc_values, bins=60, color="#4477aa")
    plt.xlabel("mean |pairwise box relation|")
    plt.ylabel("images")
    plt.title("Macroscopic correlation distribution")
    plt.tight_layout()
    plt.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
