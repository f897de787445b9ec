"""Folder inference CLI.

Public surface mirrors /root/reference/inference.py:
    python inference.py --image-dir imgs/ --model-config configs/... \
        --checkpoint x.npz [--show-dir out/]
"""
from __future__ import annotations

import argparse
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from relation_detr_tpu.data.transforms import EvalPreset
from relation_detr_tpu.models.post_process import post_process
from relation_detr_tpu.utils.checkpoint import load_weights
from relation_detr_tpu.utils.config import Config
from relation_detr_tpu.utils.logging import setup_logger
from relation_detr_tpu.utils.visualize import plot_bounding_boxes_on_image

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def parse_args():
    p = argparse.ArgumentParser("relation_detr_tpu inference")
    p.add_argument("--image-dir", required=True)
    p.add_argument("--model-config",
                   default="configs/relation_detr/relation_detr_resnet50_800_1333.py")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--show-dir", default=None)
    p.add_argument("--score-threshold", type=float, default=0.5)
    p.add_argument("--clamp-check", default="auto", choices=("auto", "on", "off"),
                   help="measure the checkpoint's tiled-MSDA clamp fraction "
                        "on the first image (logged; warns past the "
                        "threshold — same guard as test.py/train.py)")
    p.add_argument("--clamp-threshold", type=float, default=1e-3)
    return p.parse_args()


def main():
    from relation_detr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args()
    logger = setup_logger()
    model_cfg = Config(args.model_config)
    model = model_cfg.model
    preset = EvalPreset(model_cfg.get("min_size", 800), model_cfg.get("max_size", 1333))

    canvas = (800, 1344)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "denoising": jax.random.key(1)},
            jnp.zeros((1, *canvas, 3), jnp.float32),
            jnp.zeros((1, *canvas), bool),
            jnp.zeros((1, 8), jnp.int32),
            jnp.full((1, 8, 4), 0.5, jnp.float32),
            jnp.zeros((1, 8), bool),
            train=True,
        )
    )()
    class_names = None
    if args.checkpoint:
        variables = load_weights(args.checkpoint, dict(variables))
        from relation_detr_tpu.utils.class_names import load_class_names

        class_names = load_class_names(args.checkpoint)
    fwd = jax.jit(lambda v, x, m: model.apply(v, x, m, train=False))

    if args.show_dir:
        os.makedirs(args.show_dir, exist_ok=True)

    files = sorted(
        f for f in os.listdir(args.image_dir)
        if f.lower().endswith(IMAGE_EXTS)
    )
    clamp_pending = bool(args.checkpoint) and args.clamp_check != "off"
    for fname in files:
        raw = cv2.imread(os.path.join(args.image_dir, fname))
        rgb = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
        sample = preset({
            "image": rgb,
            "boxes": np.zeros((0, 4), np.float32),
            "labels": np.zeros((0,), np.int64),
            "image_id": 0,
            "orig_size": np.asarray(rgb.shape[:2], np.int64),
        })
        h, w = sample["image"].shape[:2]
        images = np.zeros((1, *canvas, 3), np.float32)
        mask = np.ones((1, *canvas), bool)
        images[0, :h, :w] = sample["image"]
        mask[0, :h, :w] = False
        if clamp_pending:
            # one-time diagnostic on the first real image: log the loaded
            # checkpoint's tiled-MSDA clamp fraction (same guard as
            # test.py:175-194 / train.py — silent border-clamping of a
            # trained checkpoint's offsets is the worst wrongness case)
            from relation_detr_tpu.utils.clamp_check import check_checkpoint_clamp

            check_checkpoint_clamp(
                model, variables, jnp.asarray(images), jnp.asarray(mask),
                threshold=args.clamp_threshold,
                force=args.clamp_check == "on",
            )
            clamp_pending = False
        out = fwd(variables, jnp.asarray(images), jnp.asarray(mask))
        # boxes are valid-region-normalized: scale by original size directly
        oh, ow = rgb.shape[:2]
        det = post_process(
            out["pred_logits"], out["pred_boxes"],
            jnp.asarray([[oh, ow]], jnp.float32), 100,
        )
        boxes = np.asarray(det["boxes"][0])
        scores = np.asarray(det["scores"][0])
        labels = np.asarray(det["labels"][0])
        keep = scores > args.score_threshold
        logger.info(f"{fname}: {int(keep.sum())} detections")
        if args.show_dir:
            vis = plot_bounding_boxes_on_image(
                raw, boxes[keep], scores[keep], labels[keep],
                class_names=class_names,
            )
            cv2.imwrite(os.path.join(args.show_dir, fname), vis)


if __name__ == "__main__":
    main()
