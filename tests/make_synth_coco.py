"""Generate a tiny synthetic COCO dataset: colored rectangles on noise."""
import json, os, sys
import numpy as np, cv2

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_coco"
rng = np.random.RandomState(0)
n_train, n_val = 16, 8
for split, n in (("train2017", n_train), ("val2017", n_val)):
    os.makedirs(f"{root}/{split}", exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(n):
        h, w = int(rng.randint(240, 420)), int(rng.randint(320, 560))
        img = rng.randint(0, 80, (h, w, 3), np.uint8)
        img_id = i + (1000 if split == "val2017" else 0)
        nb = rng.randint(1, 5)
        for _ in range(nb):
            bw, bh = int(rng.randint(40, w//2)), int(rng.randint(40, h//2))
            x, y = int(rng.randint(0, w-bw)), int(rng.randint(0, h-bh))
            cat = int(rng.randint(1, 4))  # 3 classes
            color = [(255,60,60),(60,255,60),(60,60,255)][cat-1]
            cv2.rectangle(img, (x,y), (x+bw,y+bh), color, -1)
            annotations.append({"id": aid, "image_id": img_id, "category_id": cat,
                                "bbox": [x,y,bw,bh], "area": bw*bh, "iscrowd": 0})
            aid += 1
        fname = f"{img_id:012d}.jpg"
        cv2.imwrite(f"{root}/{split}/{fname}", img)
        images.append({"id": img_id, "height": h, "width": w, "file_name": fname})
    os.makedirs(f"{root}/annotations", exist_ok=True)
    with open(f"{root}/annotations/instances_{split}.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": c, "name": f"c{c}"} for c in (1,2,3)]}, f)
print("synthetic coco at", root)
