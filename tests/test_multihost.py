"""Multi-host correctness: loader batch sharding + eval prediction merge.

The reference shards data per rank via DistributedSampler
(/root/reference/util/utils.py:79-119) and all-gathers eval predictions
(/root/reference/util/coco_eval.py:46-53). Ours shards the GLOBAL batch list
by process stride (data/loader.py::DataLoader._batches) and merges packed
detection arrays (utils/evaluation.py). This container is single-process, so
these tests exercise the sharding arithmetic and the pack/merge round trip
directly with simulated ranks.
"""
import json

import numpy as np
import pytest

from relation_detr_tpu.data.loader import DataLoader
from relation_detr_tpu.utils.coco_eval import CocoEvaluator
from relation_detr_tpu.utils.evaluation import (
    merge_packed_detections,
    pack_local_detections,
)


class _FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def _rank_batches(n, batch_size, process_count, **kw):
    per_rank = []
    for r in range(process_count):
        loader = DataLoader(
            _FakeDataset(n),
            batch_size=batch_size,
            process_index=r,
            process_count=process_count,
            **kw,
        )
        per_rank.append(loader._batches())
    return per_rank


@pytest.mark.parametrize(
    "n,bs,pc", [(17, 2, 3), (16, 4, 2), (5, 2, 4), (8, 3, 3), (100, 4, 8)]
)
def test_every_index_exactly_once_across_ranks(n, bs, pc):
    per_rank = _rank_batches(n, bs, pc)
    # equal step counts per host (collectives must stay aligned)
    lengths = {len(b) for b in per_rank}
    assert len(lengths) == 1
    seen = [i for batches in per_rank for b in batches for i in b]
    # every dataset index appears at least once; non-wraparound indices once
    counts = np.bincount(seen, minlength=n)
    assert (counts >= 1).all()
    total_batches = -(-n // bs)
    pad = (-total_batches) % pc
    # at most `pad` whole batches are duplicated (wraparound padding)
    assert (counts > 1).sum() <= pad * bs


def test_disjoint_without_padding():
    # 6 batches over 3 ranks: no padding, perfectly disjoint
    per_rank = _rank_batches(12, 2, 3)
    flat = [tuple(b) for batches in per_rank for b in batches]
    assert len(flat) == len(set(flat)) == 6
    assert sorted(i for b in flat for i in b) == list(range(12))


def test_shuffle_same_global_order_across_ranks():
    # the shuffled GLOBAL batch list must be identical on every rank for the
    # stride slices to be disjoint; verify via union coverage
    per_rank = _rank_batches(20, 2, 2, shuffle=True, seed=7)
    seen = sorted(i for batches in per_rank for b in batches for i in b)
    assert seen == list(range(20))


def test_len_matches_batches():
    for n, bs, pc in [(17, 2, 3), (5, 2, 4), (16, 4, 2)]:
        loader = DataLoader(
            _FakeDataset(n), batch_size=bs, process_index=0, process_count=pc
        )
        assert len(loader) == len(loader._batches())


def test_single_process_unchanged():
    loader = DataLoader(
        _FakeDataset(10), batch_size=3, process_index=0, process_count=1
    )
    assert loader._batches() == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9]]


# ---------------------------------------------------------------------------
# eval prediction merge


@pytest.fixture
def tiny_coco(tmp_path):
    anns = {
        "images": [
            {"id": 1, "height": 100, "width": 100, "file_name": "a.jpg"},
            {"id": 2, "height": 100, "width": 100, "file_name": "b.jpg"},
        ],
        "categories": [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 30],
             "area": 600, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 2, "bbox": [50, 50, 40, 40],
             "area": 1600, "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 1, "bbox": [0, 0, 50, 50],
             "area": 2500, "iscrowd": 0},
        ],
    }
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(anns))
    return str(path)


def _update_img1(ev, skip_if_seen=True):
    ev.update_from_arrays(
        1,
        np.asarray([[10.0, 10.0, 30.0, 40.0], [50.0, 50.0, 90.0, 90.0]]),
        np.asarray([0.9, 0.8]),
        np.asarray([1, 2]),
        skip_if_seen=skip_if_seen,
    )


def _update_img2(ev, skip_if_seen=True):
    ev.update_from_arrays(
        2,
        np.asarray([[0.0, 0.0, 50.0, 50.0]]),
        np.asarray([0.95]),
        np.asarray([1]),
        skip_if_seen=skip_if_seen,
    )


def test_pack_merge_round_trip(tiny_coco):
    # rank 0 saw image 1, rank 1 saw image 2; after the merge both match a
    # single evaluator that saw everything
    ev0 = CocoEvaluator(tiny_coco)
    _update_img1(ev0)
    ev1 = CocoEvaluator(tiny_coco)
    _update_img2(ev1)
    merge_packed_detections(ev0, [pack_local_detections(ev1)])
    ref = CocoEvaluator(tiny_coco)
    _update_img1(ref)
    _update_img2(ref)
    got = ev0.accumulate_and_summarize(verbose=False)
    want = ref.accumulate_and_summarize(verbose=False)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_merge_dedups_own_images(tiny_coco):
    # wraparound padding / self-echo: merging detections for an image this
    # evaluator already saw must be a no-op
    ev = CocoEvaluator(tiny_coco)
    _update_img1(ev)
    _update_img2(ev)
    before = ev.accumulate_and_summarize(verbose=False)
    merge_packed_detections(ev, [pack_local_detections(ev)])
    after = ev.accumulate_and_summarize(verbose=False)
    for k in before:
        assert after[k] == pytest.approx(before[k], abs=1e-12)


def test_duplicate_whole_image_update_skipped(tiny_coco):
    ev = CocoEvaluator(tiny_coco)
    _update_img1(ev)
    # the same image arriving again (padded duplicate batch) is skipped
    ev.update_from_arrays(
        1,
        np.asarray([[0.0, 0.0, 5.0, 5.0]]),
        np.asarray([0.99]),
        np.asarray([1]),
        skip_if_seen=True,
    )
    assert len(ev.dets[(1, 1)]) == 1
