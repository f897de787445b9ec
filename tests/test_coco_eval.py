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


# ---------------------------------------------------------------------------
# Frozen analytic golden (round-5 verdict item 8): a small scene whose 12
# COCO stats are derived BY HAND below — independent of both this package's
# vectorized evaluator and the brute-force transcription further down, and
# checkable against real pycocotools offline. Every IoU in the scene is
# exactly 1 or 0, so all 10 IoU thresholds coincide and the numbers reduce
# to 101-point interpolation arithmetic. Exercises: greedy one-to-one
# matching (a duplicate detection of an already-matched gt is FP), crowd
# gts (det-area-normalized IoU; matching one IGNORES the det, no FP),
# detections matched to area-range-ignored gts (ignored, not FP), unmatched
# detections with area outside the range (ignored), and maxDets prefixes.
#
# Scene (xywh):
#   img1: g1 cat1 [0,0,20,20]   area 400   (small)
#         g5 cat1 [300,300,30,30] area 900 (small)
#         g3 cat2 [200,200,120,120] area 14400 (large)
#   img2: g2 cat1 [100,100,60,60] area 3600 (medium)
#         g4 cat2 [0,0,100,100] area 10000, iscrowd=1
#   dets: d1 cat1 img1 =g1   s.9 TP | d3 cat1 img1 far, area 400, s.8 FP
#         d2 cat1 img2 =g2   s.6 TP | d8 cat1 img1 =g5 s.55 TP
#         d4 cat1 img1 =g1   s.5  FP (g1 taken by d1)
#         d5 cat2 img1 =g3   s.7 TP | d6 cat2 img2 inside g4 (crowd IoU=1,
#         ignored) s.4 | d7 cat2 img2 far, area 900, s.3 FP
#
# cat1 (all areas, maxDet 100): ranked d1 TP, d3 FP, d2 TP, d8 TP, d4 FP
#   -> rc (1/3,1/3,2/3,1,1), pr (1,.5,2/3,.75,.6), envelope (1,.75,.75,.75,.6)
#   -> 101-pt: 34 thresholds (r<=0.33) read 1.0, 67 read 0.75
#   -> AP_cat1 = (34 + 67*0.75)/101 = 0.83415841...
# cat2: d5 TP then d7 FP over 1 gt -> AP_cat2 = 1. AP = mean = 0.91707920...
# APs: only cat1 has small gts (g1,g5; g2 ignored -> d2 matches an ignored
#   gt -> ignored): ranked d1 TP, d3 FP, d8 TP, d4 FP over 2 gts
#   -> rc (.5,.5,1,1), pr (1,.5,2/3,.5), env (1,2/3,2/3,.5)
#   -> (51*1 + 50*2/3)/101 = 0.83498349...
# APm: cat1 only (g2): d2 TP alone (d1/d8 match ignored gts; d3/d4 out of
#   area) -> 1.0.  APl: cat2 only (g3): d5 TP; d6 crowd-ignored; d7 out of
#   area -> 1.0.
# AR1 (top-1 det per image): cat1 keeps d1 (img1) + d2 (img2) -> 2/3 recall;
#   cat2 keeps d5 + d6(ignored) -> 1. AR1 = (2/3+1)/2 = 5/6.
# Everything else reaches full recall -> 1.0.
# ---------------------------------------------------------------------------
def test_hand_derived_golden_stats(tmp_path):
    images = [{"id": 1, "width": 640, "height": 480},
              {"id": 2, "width": 640, "height": 480}]
    annotations = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [0, 0, 20, 20],
         "area": 400.0, "iscrowd": 0},
        {"id": 2, "image_id": 2, "category_id": 1, "bbox": [100, 100, 60, 60],
         "area": 3600.0, "iscrowd": 0},
        {"id": 3, "image_id": 1, "category_id": 2,
         "bbox": [200, 200, 120, 120], "area": 14400.0, "iscrowd": 0},
        {"id": 4, "image_id": 2, "category_id": 2, "bbox": [0, 0, 100, 100],
         "area": 10000.0, "iscrowd": 1},
        {"id": 5, "image_id": 1, "category_id": 1, "bbox": [300, 300, 30, 30],
         "area": 900.0, "iscrowd": 0},
    ]
    cats = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    ann_file = tmp_path / "golden.json"
    ann_file.write_text(json.dumps(
        {"images": images, "annotations": annotations, "categories": cats}))
    ev = CocoEvaluator(str(ann_file))
    ev.update([
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 20, 20],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [400, 400, 20, 20],
         "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [100, 100, 60, 60],
         "score": 0.6},
        {"image_id": 1, "category_id": 1, "bbox": [300, 300, 30, 30],
         "score": 0.55},
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 20, 20],
         "score": 0.5},
        {"image_id": 1, "category_id": 2, "bbox": [200, 200, 120, 120],
         "score": 0.7},
        {"image_id": 2, "category_id": 2, "bbox": [10, 10, 50, 50],
         "score": 0.4},
        {"image_id": 2, "category_id": 2, "bbox": [500, 400, 30, 30],
         "score": 0.3},
    ])
    stats = ev.accumulate_and_summarize(verbose=False)
    ap_cat1 = (34 + 67 * 0.75) / 101
    golden = {
        "AP": (ap_cat1 + 1.0) / 2,
        "AP50": (ap_cat1 + 1.0) / 2,
        "AP75": (ap_cat1 + 1.0) / 2,
        "APs": (51 + 50 * (2 / 3)) / 101,
        "APm": 1.0,
        "APl": 1.0,
        "AR1": 5 / 6,
        "AR10": 1.0,
        "AR100": 1.0,
        "ARs": 1.0,
        "ARm": 1.0,
        "ARl": 1.0,
    }
    for k, v in golden.items():
        assert stats[k] == pytest.approx(v, abs=1e-6), (k, stats[k], v)


# ---------------------------------------------------------------------------
# Property test: randomized scenes vs a literal transcription of the
# pycocotools greedy matcher (triple loop, obviously-correct-by-inspection).
# Stress cases: crowd gts (expand IoU), area-range ignores, score ties,
# IoU ties (last-scanned-gt-wins), detections matching ignored gts.
# ---------------------------------------------------------------------------
from relation_detr_tpu.utils.coco_eval import (  # noqa: E402
    AREA_RANGES,
    IOU_THRS,
    MAX_DETS,
    RECALL_THRS,
    _iou_xywh,
)


def _brute_force_eval(gts_by_key, dets_by_key, img_ids, cat_ids):
    """Literal pycocotools COCOeval bbox protocol (evaluateImg + accumulate),
    written as straight loops."""
    num_thr = len(IOU_THRS)
    precision = -np.ones((num_thr, len(RECALL_THRS), len(cat_ids),
                          len(AREA_RANGES), len(MAX_DETS)))
    recall = -np.ones((num_thr, len(cat_ids), len(AREA_RANGES), len(MAX_DETS)))
    for ci, cat_id in enumerate(cat_ids):
        for ai, (aname, arng) in enumerate(AREA_RANGES.items()):
            per_img = []
            for img_id in img_ids:
                gts = gts_by_key.get((img_id, cat_id), [])
                dets = sorted(dets_by_key.get((img_id, cat_id), []),
                              key=lambda d: -d["score"])[:MAX_DETS[-1]]
                if not gts and not dets:
                    continue
                crowd = np.array([g.get("iscrowd", 0) for g in gts], bool)
                area = np.array([g.get("area", g["bbox"][2] * g["bbox"][3])
                                 for g in gts])
                gtIg = crowd | (area < arng[0]) | (area > arng[1])
                order = np.argsort(gtIg, kind="stable")
                gts = [gts[i] for i in order]
                gtIg = gtIg[order]
                crowd = crowd[order]
                gt_boxes = np.array([g["bbox"] for g in gts]).reshape(-1, 4)
                det_boxes = np.array([d["bbox"] for d in dets]).reshape(-1, 4)
                ious = _iou_xywh(det_boxes, gt_boxes, crowd)
                G, D = len(gts), len(dets)
                gtm = -np.ones((num_thr, G), int)
                dtm = -np.ones((num_thr, D), int)
                dtIg = np.zeros((num_thr, D), bool)
                for t, thr in enumerate(IOU_THRS):
                    for d in range(D):
                        iou = min(thr, 1 - 1e-10)
                        m = -1
                        for g in range(G):
                            if gtm[t, g] >= 0 and not crowd[g]:
                                continue
                            if m > -1 and not gtIg[m] and gtIg[g]:
                                break
                            if ious[d, g] < iou:
                                continue
                            iou = ious[d, g]
                            m = g
                        if m == -1:
                            continue
                        dtIg[t, d] = gtIg[m]
                        dtm[t, d] = m
                        gtm[t, m] = d
                d_area = det_boxes[:, 2] * det_boxes[:, 3]
                oor = (d_area < arng[0]) | (d_area > arng[1])
                dtIg = dtIg | ((dtm == -1) & oor[None])
                per_img.append({
                    "scores": np.array([d["score"] for d in dets]),
                    "dtm": dtm, "dtIg": dtIg, "num_gt": int((~gtIg).sum()),
                })
            if not per_img:
                continue
            num_gt = sum(r["num_gt"] for r in per_img)
            if num_gt == 0:
                continue
            for mi, max_det in enumerate(MAX_DETS):
                scores = np.concatenate([r["scores"][:max_det] for r in per_img])
                dtm = np.concatenate([r["dtm"][:, :max_det] for r in per_img], 1)
                dtIg = np.concatenate([r["dtIg"][:, :max_det] for r in per_img], 1)
                o = np.argsort(-scores, kind="mergesort")
                dtm, dtIg = dtm[:, o], dtIg[:, o]
                tps = (dtm >= 0) & ~dtIg
                fps = (dtm == -1) & ~dtIg
                tp = np.cumsum(tps, 1).astype(float)
                fp = np.cumsum(fps, 1).astype(float)
                for t in range(num_thr):
                    rc = tp[t] / num_gt
                    pr = (tp[t] / np.maximum(tp[t] + fp[t], 1e-12)).tolist()
                    recall[t, ci, ai, mi] = rc[-1] if len(rc) else 0.0
                    for i in range(len(pr) - 1, 0, -1):
                        pr[i - 1] = max(pr[i - 1], pr[i])
                    q = np.zeros(len(RECALL_THRS))
                    for ri, pi in enumerate(np.searchsorted(rc, RECALL_THRS,
                                                            side="left")):
                        if pi < len(pr):
                            q[ri] = pr[pi]
                    precision[t, :, ci, ai, mi] = q
    return precision, recall


def _random_scene(seed, n_imgs=4, n_cats=3):
    rng = np.random.RandomState(seed)
    images, annotations, ann_id = [], [], 1
    dets = []
    for img_id in range(1, n_imgs + 1):
        images.append({"id": img_id, "width": 640, "height": 480})
        for cat in range(1, n_cats + 1):
            for _ in range(rng.randint(0, 5)):
                # mix of tiny/medium/large boxes so area ranges bite
                w = float(rng.choice([8, 40, 150]) * rng.uniform(0.5, 1.5))
                h = float(rng.choice([8, 40, 150]) * rng.uniform(0.5, 1.5))
                x = float(rng.uniform(0, 640 - w))
                y = float(rng.uniform(0, 480 - h))
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": cat,
                    "bbox": [x, y, w, h], "area": w * h,
                    "iscrowd": int(rng.rand() < 0.25),
                })
                ann_id += 1
            for _ in range(rng.randint(0, 8)):
                if annotations and rng.rand() < 0.6:
                    # perturb a gt box (creates near-threshold IoUs and
                    # occasional exact ties when perturbation is zero)
                    src = annotations[rng.randint(len(annotations))]["bbox"]
                    jitter = rng.choice([0.0, 2.0, 8.0, 25.0])
                    box = [src[0] + rng.randn() * jitter,
                           src[1] + rng.randn() * jitter,
                           max(4.0, src[2] + rng.randn() * jitter),
                           max(4.0, src[3] + rng.randn() * jitter)]
                else:
                    box = [float(rng.uniform(0, 600)), float(rng.uniform(0, 440)),
                           float(rng.uniform(4, 150)), float(rng.uniform(4, 150))]
                # quantized scores force tie-breaking stability
                dets.append({"image_id": img_id, "category_id": cat,
                             "bbox": [float(v) for v in box],
                             "score": round(float(rng.rand()), 1)})
    return images, annotations, dets


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_randomized_scene_matches_brute_force(tmp_path, seed):
    images, annotations, dets = _random_scene(seed)
    cats = [{"id": c, "name": str(c)} for c in (1, 2, 3)]
    ann_file = tmp_path / f"rand{seed}.json"
    ann_file.write_text(json.dumps(
        {"images": images, "annotations": annotations, "categories": cats}))
    ev = CocoEvaluator(str(ann_file))
    ev.update(dets)
    stats = ev.accumulate_and_summarize(verbose=False)

    from collections import defaultdict
    gts_by_key = defaultdict(list)
    for a in annotations:
        gts_by_key[(a["image_id"], a["category_id"])].append(a)
    dets_by_key = defaultdict(list)
    for d in dets:
        dets_by_key[(d["image_id"], d["category_id"])].append(d)
    precision, recall = _brute_force_eval(
        gts_by_key, dets_by_key, [i["id"] for i in images], [1, 2, 3])

    def summ(ap, iou=None, area="all", max_det=100):
        ai = list(AREA_RANGES).index(area)
        mi = MAX_DETS.index(max_det)
        s = precision[:, :, :, ai, mi] if ap else recall[:, :, ai, mi]
        if iou is not None:
            t = int(np.where(np.isclose(IOU_THRS, iou))[0][0])
            s = s[t:t + 1]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    expected = {
        "AP": summ(True), "AP50": summ(True, 0.5), "AP75": summ(True, 0.75),
        "APs": summ(True, area="small"), "APm": summ(True, area="medium"),
        "APl": summ(True, area="large"), "AR1": summ(False, max_det=1),
        "AR10": summ(False, max_det=10), "AR100": summ(False),
        "ARs": summ(False, area="small"), "ARm": summ(False, area="medium"),
        "ARl": summ(False, area="large"),
    }
    for key, want in expected.items():
        assert stats[key] == pytest.approx(want, abs=1e-9), key
