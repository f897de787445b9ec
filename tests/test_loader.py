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


def test_loader_iterates_all_batches():
    ds = FakeDataset(10)
    loader = DataLoader(ds, batch_size=4, shuffle=True, fixed_canvas=(512, 704), max_gt=8)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["images"].shape[0] == 4
    # padded tail sample has no gts and id -1
    assert (batches[-1]["image_ids"] == -1).sum() == 2
