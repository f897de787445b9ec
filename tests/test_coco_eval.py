import json

import numpy as np
import pytest

from relation_detr_tpu.utils.coco_eval import CocoEvaluator


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


def test_perfect_predictions_give_ap1(tiny_coco):
    ev = CocoEvaluator(tiny_coco)
    ev.update([
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 30], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [50, 50, 40, 40], "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [0, 0, 50, 50], "score": 0.95},
    ])
    stats = ev.accumulate_and_summarize(verbose=False)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AR100"] == pytest.approx(1.0)


def test_no_predictions_give_ap0(tiny_coco):
    ev = CocoEvaluator(tiny_coco)
    stats = ev.accumulate_and_summarize(verbose=False)
    assert stats["AP"] == pytest.approx(0.0)


def test_halfway_iou_counts_at_50_not_75(tiny_coco):
    ev = CocoEvaluator(tiny_coco)
    # shifted box: IoU vs [0,0,50,50] of [10,0,50,50] = 40*50/(2*2500-2000)=2/3
    ev.update([
        {"image_id": 2, "category_id": 1, "bbox": [10, 0, 50, 50], "score": 0.9},
    ])
    stats = ev.accumulate_and_summarize(verbose=False)
    assert stats["AP50"] > 0.0
    assert stats["AP75"] == pytest.approx(0.0)


def test_false_positive_lowers_precision(tiny_coco):
    ev = CocoEvaluator(tiny_coco)
    ev.update([
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 30], "score": 0.6},
        # higher-scored false positive of the same class
        {"image_id": 1, "category_id": 1, "bbox": [80, 80, 10, 10], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [50, 50, 40, 40], "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [0, 0, 50, 50], "score": 0.95},
    ])
    stats = ev.accumulate_and_summarize(verbose=False)
    assert 0.5 < stats["AP"] < 1.0


def test_update_from_arrays_xyxy(tiny_coco):
    ev = CocoEvaluator(tiny_coco)
    ev.update_from_arrays(
        1,
        np.asarray([[10.0, 10.0, 30.0, 40.0]]),
        np.asarray([0.9]),
        np.asarray([1]),
    )
    ev.update_from_arrays(
        1, np.asarray([[50.0, 50.0, 90.0, 90.0]]), np.asarray([0.8]), np.asarray([2])
    )
    ev.update_from_arrays(
        2, np.asarray([[0.0, 0.0, 50.0, 50.0]]), np.asarray([0.95]), np.asarray([1])
    )
    stats = ev.accumulate_and_summarize(verbose=False)
    assert stats["AP"] == pytest.approx(1.0)
