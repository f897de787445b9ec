"""Environment dump at startup (mirrors /root/reference/util/collect_env.py)."""
from __future__ import annotations

import os
import platform
import sys


def collect_env_info() -> str:
    lines = [
        f"python: {sys.version.split()[0]} ({platform.platform()})",
    ]
    try:
        import jax

        lines.append(f"jax: {jax.__version__}")
        try:
            devices = jax.devices()
            lines.append(
                f"devices: {len(devices)} x {devices[0].device_kind if devices else 'none'}"
            )
            lines.append(f"default backend: {jax.default_backend()}")
        except Exception as e:
            lines.append(f"devices: unavailable ({e})")
    except ImportError:
        lines.append("jax: not installed")
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy", "cv2"):
        try:
            m = __import__(mod)
            for part in mod.split(".")[1:]:
                m = getattr(m, part)
            lines.append(f"{mod}: {getattr(m, '__version__', 'unknown')}")
        except ImportError:
            lines.append(f"{mod}: not installed")
    for var in ("XLA_FLAGS", "JAX_PLATFORMS", "LIBTPU_INIT_ARGS"):
        if os.environ.get(var):
            lines.append(f"{var}={os.environ[var]}")
    return "\n".join(lines)
