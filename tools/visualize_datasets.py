"""Dump augmented dataset samples with boxes drawn (mirrors
/root/reference/tools/visualize_datasets.py).

    python tools/visualize_datasets.py --coco-path data/coco --show-dir out/ \
        [--num-images 20] [--preset detr]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")

import cv2
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--coco-path", default="data/coco")
    p.add_argument("--split", default="train2017")
    p.add_argument("--show-dir", required=True)
    p.add_argument("--num-images", type=int, default=20)
    p.add_argument("--preset", default="detr", choices=["detr", "none"])
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    from relation_detr_tpu.data import transforms
    from relation_detr_tpu.data.coco import CocoDetection
    from relation_detr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from relation_detr_tpu.utils.visualize import plot_bounding_boxes_on_image

    tf = transforms.detr(seed=args.seed) if args.preset == "detr" else None
    dataset = CocoDetection(
        img_folder=os.path.join(args.coco_path, args.split),
        ann_file=os.path.join(
            args.coco_path, "annotations", f"instances_{args.split}.json"
        ),
        transforms=tf,
        train=True,
    )
    os.makedirs(args.show_dir, exist_ok=True)
    for i in range(min(args.num_images, len(dataset))):
        s = dataset[i]
        img = s["image"]
        if img.dtype != np.uint8:  # de-normalize for display
            img = ((img * IMAGENET_STD + IMAGENET_MEAN) * 255).clip(0, 255).astype(np.uint8)
        bgr = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        vis = plot_bounding_boxes_on_image(
            bgr, s["boxes"], np.ones(len(s["boxes"])), s["labels"]
        )
        cv2.imwrite(os.path.join(args.show_dir, f"{s['image_id']:012d}.jpg"), vis)
    print(f"wrote {min(args.num_images, len(dataset))} samples to {args.show_dir}")


if __name__ == "__main__":
    main()
