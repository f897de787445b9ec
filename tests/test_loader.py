import numpy as np

from relation_detr_tpu.data.loader import DataLoader, collate, pick_canvas


class FakeDataset:
    def __init__(self, n=10, seed=0):
        self.rng = np.random.RandomState(seed)
        self.sizes = [(self.rng.randint(200, 500), self.rng.randint(200, 700))
                      for _ in range(n)]

    def __len__(self):
        return len(self.sizes)

    def __getitem__(self, i):
        h, w = self.sizes[i]
        nb = self.rng.randint(0, 5)
        xy = self.rng.uniform(0, [w * 0.6, h * 0.6], (nb, 2))
        wh = self.rng.uniform(10, [w * 0.3, h * 0.3], (nb, 2))
        return {
            "image": np.zeros((h, w, 3), np.float32),
            "boxes": np.concatenate([xy, xy + wh], -1).astype(np.float32),
            "labels": self.rng.randint(0, 91, nb).astype(np.int64),
            "image_id": i,
            "orig_size": np.asarray([h, w], np.int64),
        }


def test_pick_canvas_smallest_fit():
    buckets = ((512, 704), (800, 1344))
    assert pick_canvas(500, 700, buckets) == (512, 704)
    assert pick_canvas(513, 100, buckets) == (800, 1344)
    assert pick_canvas(2000, 2000, buckets) == (800, 1344)  # fallback largest


def test_collate_static_shapes_and_normalization():
    ds = FakeDataset()
    batch = collate([ds[0], ds[1]], fixed_canvas=(512, 704), max_gt=16)
    assert batch["images"].shape == (2, 512, 704, 3)
    assert batch["mask"].shape == (2, 512, 704)
    assert batch["gt_boxes"].shape == (2, 16, 4)
    # valid region unmasked
    h, w = ds.sizes[0]
    assert not batch["mask"][0, : h - 1, : w - 1].any()
    assert batch["mask"][0, h:, :].all()
    # normalized boxes inside [0, 1]
    valid = batch["gt_valid"]
    assert (batch["gt_boxes"][valid] >= 0).all() and (batch["gt_boxes"][valid] <= 1).all()


def test_collate_gt_capacity_buckets():
    """GT-capacity bucketing (PERF.md round 5): the batch pads to the
    smallest bucket that fits its max instance count — the matcher's serial
    windows scale with PADDED rows, so small-GT batches (~92% of COCO at
    B=1) run the cheap trace. No boxes are ever dropped by bucketing."""
    ds = FakeDataset()

    def with_n_boxes(sample, n):
        s = dict(sample)
        s["boxes"] = np.tile(
            np.asarray([[10.0, 10.0, 60.0, 60.0]], np.float32), (n, 1))
        s["labels"] = np.full((n,), 3, np.int64)
        return s

    few = with_n_boxes(ds[0], 2)
    b = collate([few], fixed_canvas=(512, 704), gt_buckets=(16, 100))
    assert b["gt_boxes"].shape == (1, 16, 4)
    assert b["gt_valid"].sum() == 2
    many = with_n_boxes(ds[1], 40)
    b = collate([few, many], fixed_canvas=(512, 704), gt_buckets=(16, 100))
    assert b["gt_boxes"].shape == (2, 100, 4)
    assert b["gt_valid"][1].sum() == 40  # nothing dropped
    # buckets above max_gt never apply; no bucket fits -> plain max_gt pad
    b = collate([many], fixed_canvas=(512, 704), max_gt=8,
                gt_buckets=(16, 100))
    assert b["gt_boxes"].shape == (1, 8, 4)
    # disabled -> always max_gt
    b = collate([few], fixed_canvas=(512, 704), gt_buckets=None)
    assert b["gt_boxes"].shape == (1, 100, 4)


def test_loader_iterates_all_batches():
    ds = FakeDataset(10)
    loader = DataLoader(ds, batch_size=4, shuffle=True, fixed_canvas=(512, 704), max_gt=8)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["images"].shape[0] == 4
    # padded tail sample has no gts and id -1
    assert (batches[-1]["image_ids"] == -1).sum() == 2


def test_uint8_canvas_device_normalize_matches_host():
    """EvalPreset(normalize_host=False) + device normalization must equal the
    host-normalized fp32 canvas exactly (padding = 0 in normalized space)."""
    import jax.numpy as jnp

    from relation_detr_tpu.data.loader import collate
    from relation_detr_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        normalize,
    )

    rng = np.random.RandomState(0)
    raw = {
        "image": rng.randint(0, 255, (40, 56, 3), np.uint8),
        "boxes": np.asarray([[4, 4, 30, 30]], np.float32),
        "labels": np.asarray([1], np.int64),
        "image_id": 7,
        "orig_size": np.asarray([40, 56], np.int64),
    }
    b_u8 = collate([dict(raw)], fixed_canvas=(48, 64))
    b_f32 = collate([normalize(dict(raw))], fixed_canvas=(48, 64))
    assert b_u8["images"].dtype == np.uint8
    images = jnp.asarray(b_u8["images"])
    mask = jnp.asarray(b_u8["mask"])
    x = (images.astype(jnp.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    x = jnp.where(mask[..., None], 0.0, x)
    np.testing.assert_allclose(np.asarray(x), b_f32["images"], atol=1e-6)
