import numpy as np
import pytest

from relation_detr_tpu.data import transforms as T
from relation_detr_tpu.data.mix_transforms import MixUp, Mosaic, SimpleCopyPaste


def make_sample(h=120, w=160, n=3, seed=0):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(0, [w * 0.5, h * 0.5], (n, 2))
    wh = rng.uniform(10, [w * 0.4, h * 0.4], (n, 2))
    return {
        "image": rng.randint(0, 255, (h, w, 3), np.uint8),
        "boxes": np.concatenate([xy, xy + wh], -1).astype(np.float32),
        "labels": rng.randint(0, 5, n).astype(np.int64),
        "image_id": seed,
        "orig_size": np.asarray([h, w], np.int64),
    }


class FakeDataset:
    def __init__(self, n=6):
        self.samples = [make_sample(seed=i) for i in range(n)]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_hflip_preserves_box_geometry():
    s = make_sample()
    f = T.hflip(s)
    w = s["image"].shape[1]
    widths = s["boxes"][:, 2] - s["boxes"][:, 0]
    f_widths = f["boxes"][:, 2] - f["boxes"][:, 0]
    np.testing.assert_allclose(widths, f_widths, rtol=1e-6)
    np.testing.assert_allclose(f["boxes"][:, 0], w - s["boxes"][:, 2], rtol=1e-6)


def test_resize_shortest_respects_max():
    s = make_sample(120, 400)
    r = T.resize_shortest(s, 200, max_size=500)
    assert max(r["image"].shape[:2]) <= 500
    ratio = r["image"].shape[0] / 120
    np.testing.assert_allclose(r["boxes"], s["boxes"] * ratio, rtol=1e-2)


def test_detr_preset_produces_normalized_float():
    preset = T.detr(seed=1)
    out = preset(make_sample())
    assert out["image"].dtype == np.float32
    assert abs(float(out["image"].mean())) < 3.0


def test_lsj_preset_fixed_canvas():
    preset = T.LSJPreset(size=256, seed=0)
    out = preset(make_sample())
    assert out["image"].shape[:2] == (256, 256)
    assert (out["boxes"] >= 0).all()


def test_mosaic_combines_four_images():
    ds = FakeDataset()
    mosaic = Mosaic(ds, p=1.0, target_size=128, seed=0)
    out = mosaic(make_sample())
    assert out["image"].shape[:2] == (256, 256)
    assert len(out["boxes"]) >= 1
    assert (out["boxes"][:, 2:] > out["boxes"][:, :2]).all()


def test_mixup_concatenates_targets():
    ds = FakeDataset()
    mix = MixUp(ds, p=1.0, seed=0)
    s = make_sample()
    out = mix(s)
    assert len(out["boxes"]) >= len(s["boxes"])


def test_copy_paste_adds_boxes():
    ds = FakeDataset()
    cp = SimpleCopyPaste(ds, p=1.0, seed=0)
    s = make_sample(300, 300)
    out = cp(s)
    assert len(out["boxes"]) > len(s["boxes"])


def test_class_agnostic_dataset(tmp_path):
    import json

    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((50, 50, 3), np.uint8))
    ann = {
        "images": [{"id": 1, "height": 50, "width": 50, "file_name": "a.jpg"}],
        "categories": [{"id": 7, "name": "x"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7, "bbox": [5, 5, 20, 20],
             "area": 400, "iscrowd": 0}
        ],
    }
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    from relation_detr_tpu.data.coco import CocoDetection

    ds = CocoDetection(str(img_dir), str(ann_file), class_agnostic=True)
    assert ds[0]["labels"].tolist() == [1]
