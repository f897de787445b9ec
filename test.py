"""Evaluation CLI: COCO val mAP.

Public surface mirrors /root/reference/test.py:
    python test.py --coco-path data/coco --model-config configs/... --checkpoint x.npz
Eval resize happens host-side into static canvas buckets; box rescaling uses
original image sizes (mirrors PostProcess semantics, post_process.py:40-43).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from relation_detr_tpu.data.coco import CocoDetection
from relation_detr_tpu.data.loader import DataLoader
from relation_detr_tpu.data.transforms import EvalPreset
from relation_detr_tpu.utils.checkpoint import load_weights
from relation_detr_tpu.utils.coco_eval import CocoEvaluator
from relation_detr_tpu.utils.config import Config
from relation_detr_tpu.utils.logging import MetricLogger, setup_logger


def parse_args():
    p = argparse.ArgumentParser("relation_detr_tpu evaluation")
    p.add_argument("--coco-path", default="data/coco")
    p.add_argument("--split", default="val2017")
    p.add_argument("--model-config",
                   default="configs/relation_detr/relation_detr_resnet50_800_1333.py")
    p.add_argument("--checkpoint", default=None, help=".npz weight file")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--result-json", default=None, help="dump predictions json")
    p.add_argument("--eval-json", default=None,
                   help="re-score an existing predictions json without a model "
                        "(mirrors reference test.py:130-172)")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--per-category", action="store_true",
                   help="print the per-category AP/AR table")
    p.add_argument("--show-dir", default=None,
                   help="save images with predicted boxes drawn (mirrors "
                        "reference test.py:175-191)")
    p.add_argument("--show-conf", type=float, default=0.5,
                   help="confidence threshold for --show-dir rendering")
    p.add_argument("--msda-impl", default=None,
                   help="MSDA kernel override (auto|corner_pack|gather|...)")
    p.add_argument("--msda-halos", default=None,
                   help="per-level halo radii for the tiled encoder kernel, "
                        "comma-separated (e.g. 4,3,2,2 = measured fast "
                        "profile) or 'auto' (default: num_points+1 per "
                        "level, exact at the reference offset init); the "
                        "checkpoint's clamp fraction is measured and logged "
                        "at load time")
    p.add_argument("--msda-dtype", default=None,
                   choices=("auto", "fp32", "bf16"),
                   help="dtype the tiled MSDA A-matrix/patch contraction is "
                        "built in (default auto = bf16 on TPU, fp32 on CPU: "
                        "the MXU rounds f32 dot operands to bf16 anyway — "
                        "measured bitwise-identical, PERF.md round 3e — so "
                        "bf16 only halves A traffic; fp32 forces a "
                        "fp32-built A for calibration)")
    p.add_argument("--msda-int8-slab", action="store_true",
                   help="store the tiled encoder's patch slab int8 with "
                        "per-channel scales (dequant fused after the MXU "
                        "dot): 36.5 vs 39.3 ms/img default, 31.9 ms with "
                        "the fast profile (PERF.md round 5). Quantization "
                        "error ~amax/254 per value channel — beyond the "
                        "bitwise-proven bf16 class, so OFF by default; "
                        "validate mAP on your eval set before shipping")
    p.add_argument("--clamp-check", default="auto", choices=("auto", "on", "off"),
                   help="measure the checkpoint's tiled-MSDA clamp fraction "
                        "on the first batch at load time (auto = when the "
                        "tiled kernel is in play); errors above "
                        "--clamp-threshold if --msda-halos was forced")
    p.add_argument("--clamp-threshold", type=float, default=1e-3)
    p.add_argument("--msda-profile", default="auto",
                   choices=("auto", "exact", "fast"),
                   help="auto (default): measure this checkpoint's clamp "
                        "fraction at load and switch to the reduced-halo "
                        "profile (halos 4,3,2,2, no overflow channel — "
                        "35.1 vs 42.5 ms/img on the flagship, PERF.md "
                        "round 5) when the measured attention-weighted "
                        "fraction is <= 1e-6; exact: always stay on the "
                        "init-exact default (auto halos + margin 1); fast: "
                        "force the reduced-halo profile (the clamp check "
                        "still errors if it would clamp this checkpoint "
                        "above --clamp-threshold)")
    return p.parse_args()


def _render_prediction(dataset, image_id, boxes, scores, labels, show_dir,
                       conf, cat_names):
    """Draw predictions over the original image (reference test.py:175-191
    --show-dir path; rendering via util/visualize.py semantics)."""
    import cv2

    from relation_detr_tpu.utils.visualize import plot_bounding_boxes_on_image

    os.makedirs(show_dir, exist_ok=True)
    info = dataset.images[image_id]
    path = os.path.join(dataset.img_folder, info["file_name"])
    image = cv2.imread(path)  # BGR, original size
    if image is None:
        return
    keep = scores >= conf
    names = None
    if cat_names:
        names = [cat_names.get(i, str(i)) for i in range(max(cat_names) + 1)]
    out = plot_bounding_boxes_on_image(
        image, boxes[keep], scores[keep], labels[keep], class_names=names
    )
    cv2.imwrite(os.path.join(show_dir, os.path.basename(info["file_name"])), out)


def _category_names(ann_file):
    try:
        with open(ann_file) as f:
            return {c["id"]: c["name"] for c in json.load(f)["categories"]}
    except (OSError, KeyError, ValueError):
        return None


def main():
    args = parse_args()
    from relation_detr_tpu.ops.msda import apply_msda_cli_flags
    from relation_detr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    apply_msda_cli_flags(args)
    logger = setup_logger()
    ann_file = os.path.join(
        args.coco_path, "annotations", f"instances_{args.split}.json"
    )
    if args.eval_json:
        evaluator = CocoEvaluator(ann_file)
        with open(args.eval_json) as f:
            evaluator.update(json.load(f))
        stats = evaluator.accumulate_and_summarize(
            per_category=args.per_category,
            category_names=_category_names(ann_file),
        )
        logger.info(f"mAP: {stats['AP']:.4f}  AP50: {stats['AP50']:.4f}")
        return

    model_cfg = Config(args.model_config)
    model = model_cfg.model
    dataset = CocoDetection(
        img_folder=os.path.join(args.coco_path, args.split),
        ann_file=ann_file,
        transforms=EvalPreset(model_cfg.get("min_size", 800),
                              model_cfg.get("max_size", 1333),
                              normalize_host=False),  # uint8 upload, 4x less
    )
    if args.max_images:
        dataset.ids = dataset.ids[: args.max_images]
    # adaptive canvas buckets: portrait images resize up to (1333, 800), so a
    # fixed landscape canvas would silently downscale them (mAP loss); each
    # bucket compiles once.
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False)

    # init then overwrite with checkpoint
    canvas = (args.batch_size, 800, 1344)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "denoising": jax.random.key(1)},
            jnp.zeros((*canvas, 3), jnp.float32),
            jnp.zeros(canvas, bool),
            jnp.zeros((args.batch_size, 8), jnp.int32),
            jnp.full((args.batch_size, 8, 4), 0.5, jnp.float32),
            jnp.zeros((args.batch_size, 8), bool),
            train=True,
        )
    )()
    if args.checkpoint:
        variables = load_weights(args.checkpoint, dict(variables))
        if args.msda_profile == "fast":
            from relation_detr_tpu.ops.msda import set_msda_defaults
            from relation_detr_tpu.utils.clamp_check import FAST_HALOS

            set_msda_defaults(tiled_halos=FAST_HALOS, tiled_overflow=0)
        if args.clamp_check != "off":
            # one captured forward on the first batch: log the checkpoint's
            # tiled-kernel clamp fraction, fail loudly if the user forced
            # clamping halos, and auto-select the fast profile when this
            # checkpoint's offsets provably fit it
            # (utils/clamp_check.py; round-2 verdict item 2)
            from relation_detr_tpu.utils.clamp_check import check_and_select_profile

            first = next(iter(loader), None)
            if first is not None:
                check_and_select_profile(
                    model, variables, first["images"], first["mask"],
                    threshold=args.clamp_threshold,
                    halos_forced=(bool(args.msda_halos)
                                  and args.msda_halos != "auto")
                    or args.msda_profile == "fast",
                    # auto-select fast halos + overflow 0 when the measured
                    # fraction is <= 1e-6 (35.1 vs 42.5 ms, PERF.md round 5)
                    allow_fast=args.msda_profile == "auto",
                    force=args.clamp_check == "on",
                )

    from relation_detr_tpu.utils.evaluation import (
        detection_stream,
        make_detections_fn,
    )

    # one jitted dispatch per batch: forward + top-k decode + packed result
    # (model boxes are normalized to the VALID image region — valid-ratio
    # convention of base_transformer.py:56-70 — so PostProcess scales by the
    # original size directly, post_process.py:40-43). The stream dispatches
    # batch k+1 before fetching batch k, overlapping device compute with the
    # host-side COCO accumulation (all chips used when batch divides them).
    topk = model_cfg.get("select_box_nums_for_evaluation", 300)
    det_fn = make_detections_fn(model, args.batch_size, topk)

    evaluator = CocoEvaluator(ann_file)
    metric = MetricLogger(print_freq=50, logger=logger)
    all_predictions = []
    for batch, det in detection_stream(
        det_fn, variables, loader,
        progress=lambda it: metric.log_every(it, "eval"),
    ):
        boxes = det[:, :, :4]
        scores = det[:, :, 4]
        labels = det[:, :, 5].astype(np.int64)
        for i in range(len(boxes)):
            if batch["image_ids"][i] < 0:
                continue  # tail padding
            b = boxes[i]
            evaluator.update_from_arrays(int(batch["image_ids"][i]), b, scores[i], labels[i], skip_if_seen=True)
            if args.show_dir:
                _render_prediction(
                    dataset, int(batch["image_ids"][i]), b, scores[i],
                    labels[i], args.show_dir, args.show_conf,
                    _category_names(ann_file),
                )
            if args.result_json:
                for bb, ss, ll in zip(b, scores[i], labels[i]):
                    all_predictions.append({
                        "image_id": int(batch["image_ids"][i]),
                        "category_id": int(ll),
                        "bbox": [float(bb[0]), float(bb[1]),
                                 float(bb[2] - bb[0]), float(bb[3] - bb[1])],
                        "score": float(ss),
                    })

    stats = evaluator.accumulate_and_summarize(
        per_category=args.per_category, category_names=_category_names(ann_file)
    )
    logger.info(f"mAP: {stats['AP']:.4f}  AP50: {stats['AP50']:.4f}")
    if args.result_json:
        with open(args.result_json, "w") as f:
            json.dump(all_predictions, f)
        logger.info(f"wrote {len(all_predictions)} predictions to {args.result_json}")


if __name__ == "__main__":
    main()
