"""Export the eval forward to StableHLO (the TPU-native analogue of the
reference's ONNX export, /root/reference/tools/pytorch2onnx.py).

    python tools/export_model.py --model-config configs/... \
        [--checkpoint x.npz] --output model.stablehlo [--verify]

The exported module is the jitted eval forward at a fixed canvas; numeric
verification compares a reload-free second trace against the live model
(rtol 1e-3 / atol 1e-5, matching pytorch2onnx.py:116-129).
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model-config",
                   default="configs/relation_detr/relation_detr_resnet50_800_1333.py")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--verify", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    from relation_detr_tpu.models.post_process import post_process
    from relation_detr_tpu.utils.checkpoint import load_weights
    from relation_detr_tpu.utils.config import Config

    cfg = Config(args.model_config)
    model = cfg.model
    B, H, W, G = 1, args.height, args.width, 8
    images = jnp.zeros((B, H, W, 3), jnp.float32)
    mask = jnp.zeros((B, H, W), bool)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "denoising": jax.random.key(1)},
            images, mask, jnp.zeros((B, G), jnp.int32),
            jnp.full((B, G, 4), 0.5, jnp.float32), jnp.zeros((B, G), bool),
            train=True,
        )
    )()
    if args.checkpoint:
        variables = dict(variables)
        variables["params"] = load_weights(args.checkpoint, variables["params"])

    topk = cfg.get("select_box_nums_for_evaluation", 300)

    def serving_fn(images, mask, target_sizes):
        out = model.apply(variables, images, mask, train=False)
        det = post_process(out["pred_logits"], out["pred_boxes"], target_sizes, topk)
        return det["scores"], det["labels"], det["boxes"]

    sizes = jnp.asarray([[float(H), float(W)]], jnp.float32)
    lowered = jax.jit(serving_fn).lower(images, mask, sizes)
    stablehlo = lowered.as_text(dialect="stablehlo")
    with open(args.output, "w") as f:
        f.write(stablehlo)
    print(f"wrote {len(stablehlo)} bytes of StableHLO to {args.output}")

    if args.verify:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
        s1 = jax.jit(serving_fn)(x, mask, sizes)
        s2 = serving_fn(x, mask, sizes)
        for a, b, name in zip(s1, s2, ("scores", "labels", "boxes")):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-3, atol=1e-5,
            )
        print("verify: jitted vs eager outputs match (rtol 1e-3, atol 1e-5)")


if __name__ == "__main__":
    main()
