"""Generate a val2017-SCALE synthetic COCO set (default 5000 images) for
end-to-end eval wall-time measurement (VERDICT round-1 item: full-scale eval
within 1.5x of pure model-forward time).

Images share one aspect ratio so the whole run hits ONE canvas bucket (each
distinct eval canvas costs a multi-minute TPU compile on axon — CLAUDE.md).

    python tools/make_synth_coco_scale.py /tmp/synth5k --n-val 5000
"""
import argparse
import json
import os

import cv2
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--n-val", type=int, default=5000)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    split = "val2017"
    os.makedirs(f"{args.root}/{split}", exist_ok=True)
    images, annotations = [], []
    aid = 1
    h, w = args.height, args.width
    for i in range(args.n_val):
        img = rng.randint(0, 80, (h, w, 3), np.uint8)
        img_id = i + 1
        for _ in range(int(rng.randint(1, 6))):
            bw, bh = int(rng.randint(40, w // 2)), int(rng.randint(40, h // 2))
            x, y = int(rng.randint(0, w - bw)), int(rng.randint(0, h - bh))
            cat = int(rng.randint(1, 4))
            color = [(255, 60, 60), (60, 255, 60), (60, 60, 255)][cat - 1]
            cv2.rectangle(img, (x, y), (x + bw, y + bh), color, -1)
            annotations.append({"id": aid, "image_id": img_id,
                                "category_id": cat, "bbox": [x, y, bw, bh],
                                "area": bw * bh, "iscrowd": 0})
            aid += 1
        fname = f"{img_id:012d}.jpg"
        cv2.imwrite(f"{args.root}/{split}/{fname}", img,
                    [cv2.IMWRITE_JPEG_QUALITY, 70])
        images.append({"id": img_id, "height": h, "width": w,
                       "file_name": fname})
    os.makedirs(f"{args.root}/annotations", exist_ok=True)
    with open(f"{args.root}/annotations/instances_{split}.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": c, "name": f"c{c}"}
                                  for c in (1, 2, 3)]}, f)
    print(f"synthetic {args.n_val}-image val set at {args.root}")


if __name__ == "__main__":
    main()
