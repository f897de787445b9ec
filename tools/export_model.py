"""Export the eval forward as a serialized StableHLO artifact (the TPU-native
analogue of the reference's ONNX export, /root/reference/tools/pytorch2onnx.py).

    python tools/export_model.py --model-config configs/... \
        [--checkpoint x.npz] --output model.jaxexport [--verify] [--mlir-out m.mlir]

The artifact is a jax.export serialization (portable StableHLO + calling
convention) of the jitted eval forward at a fixed canvas. ``--verify``
round-trips the artifact THROUGH DISK — reads the written file back,
deserializes, executes it, and compares against the live model at
rtol 1e-3 / atol 1e-5, matching the reference's onnxruntime verification
(pytorch2onnx.py:116-129). A corrupted file fails verification.
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model-config",
                   default="configs/relation_detr/relation_detr_resnet50_800_1333.py")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--mlir-out", default=None,
                   help="also dump human-readable StableHLO text here")
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--verify", action="store_true")
    return p.parse_args()


def build_serving_fn(model_config: str, height: int, width: int,
                     checkpoint: str = None):
    """Returns (serving_fn, example_args). serving_fn closes over weights and
    maps (images, mask, target_sizes) -> (scores, labels, boxes)."""
    from relation_detr_tpu.models.post_process import post_process
    from relation_detr_tpu.utils.checkpoint import load_weights
    from relation_detr_tpu.utils.config import Config

    cfg = Config(model_config)
    model = cfg.model
    B, H, W, G = 1, height, width, 8
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
    if checkpoint:
        variables = dict(variables)
        variables["params"] = load_weights(checkpoint, variables["params"])

    topk = cfg.get("select_box_nums_for_evaluation", 300)

    def serving_fn(images, mask, target_sizes):
        out = model.apply(variables, images, mask, train=False)
        det = post_process(out["pred_logits"], out["pred_boxes"], target_sizes, topk)
        return det["scores"], det["labels"], det["boxes"]

    sizes = jnp.asarray([[float(H), float(W)]], jnp.float32)
    return serving_fn, (images, mask, sizes)


def main():
    args = parse_args()
    serving_fn, (images, mask, sizes) = build_serving_fn(
        args.model_config, args.height, args.width, args.checkpoint
    )

    exported = jax_export.export(jax.jit(serving_fn))(images, mask, sizes)
    blob = exported.serialize()
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"wrote {len(blob)} bytes (serialized StableHLO) to {args.output}")
    if args.mlir_out:
        with open(args.mlir_out, "w") as f:
            f.write(exported.mlir_module())
        print(f"wrote StableHLO text to {args.mlir_out}")

    if args.verify:
        # true round trip: re-read the artifact from disk and execute it
        with open(args.output, "rb") as f:
            reloaded = jax_export.deserialize(f.read())
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*images.shape).astype(np.float32))
        live = jax.jit(serving_fn)(x, mask, sizes)
        roundtrip = reloaded.call(x, mask, sizes)
        for a, b, name in zip(roundtrip, live, ("scores", "labels", "boxes")):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-3, atol=1e-5, err_msg=name,
            )
        print("verify: deserialized artifact matches live model "
              "(rtol 1e-3, atol 1e-5)")


if __name__ == "__main__":
    main()
