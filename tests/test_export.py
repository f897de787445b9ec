"""Export round-trip: serialize -> disk -> deserialize -> execute -> compare.

Mirrors the reference's onnxruntime verification of the written artifact
(/root/reference/tools/pytorch2onnx.py:116-129): the thing being tested is
the file on disk, not a second live trace.
"""
import importlib.util
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export as jax_export

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load_export_module():
    spec = importlib.util.spec_from_file_location(
        "export_model", REPO / "tools" / "export_model.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_export_roundtrip_and_corruption(tmp_path):
    mod = _load_export_module()
    serving_fn, (images, mask, sizes) = mod.build_serving_fn(
        str(REPO / "configs/relation_detr/relation_detr_resnet50_tiny_test.py"),
        128, 128,
    )
    exported = jax_export.export(jax.jit(serving_fn))(images, mask, sizes)
    blob = exported.serialize()
    artifact = tmp_path / "model.jaxexport"
    artifact.write_bytes(blob)

    reloaded = jax_export.deserialize(artifact.read_bytes())
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*images.shape).astype(np.float32))
    live = jax.jit(serving_fn)(x, mask, sizes)
    roundtrip = reloaded.call(x, mask, sizes)
    for a, b, name in zip(roundtrip, live, ("scores", "labels", "boxes")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-3, atol=1e-5, err_msg=name,
        )

    # a corrupted artifact must NOT silently verify: either deserialization
    # fails or the executed outputs diverge from the live model
    corrupted = bytearray(blob)
    third = len(corrupted) // 3
    for i in range(third, 2 * third, 997):  # a spray across the middle third
        corrupted[i] ^= 0xFF
    verified_ok = False
    try:
        bad = jax_export.deserialize(bytes(corrupted))
        out = bad.call(x, mask, sizes)
        for a, b in zip(out, live):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-3, atol=1e-5,
            )
        verified_ok = True
    except Exception:
        pass
    assert not verified_ok, "corrupted artifact passed verification"
