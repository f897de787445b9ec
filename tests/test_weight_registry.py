"""Pretrained-weight name registry (reference arch→URL tables minus download).

Reference surface: /root/reference/models/backbones/resnet.py:344-414 (URL
tables bound per arch), swin.py:632-753, focalnet.py:379-405. Zero-egress
here, so resolution targets a local converted-.npz cache.
"""
import os

import pytest

from relation_detr_tpu.utils.weight_registry import (
    DEFAULT_ARCH_WEIGHTS,
    WEIGHT_URLS,
    lookup_url,
    resolve_pretrained,
)


def test_reference_table_parity():
    # the reference's resnet table binds v2 torchvision weights to the plain
    # arch names (resnet.py:368-414); swin_l binds the in22k release
    assert lookup_url("resnet50").endswith("resnet50-11ad3fa6.pth")
    assert lookup_url("swin_l").endswith("swin_large_patch4_window7_224_22k.pth")
    # every default-arch binding must resolve to a registered URL
    for arch, key in DEFAULT_ARCH_WEIGHTS.items():
        assert key in WEIGHT_URLS, (arch, key)
    # release detectors from the reference README are registered
    assert "relation_detr_resnet50_800_1333_coco_1x" in WEIGHT_URLS
    assert lookup_url("nonexistent_arch") is None


def test_swin_arch_table_has_v2_s():
    from relation_detr_tpu.models.backbones.swin import ARCH_SETTINGS

    embed, depths, heads, window, v2 = ARCH_SETTINGS["swin_v2_s"]
    assert (embed, depths, window, v2) == (96, (2, 2, 18, 2), 8, True)
    assert lookup_url("swin_v2_s").endswith("swin_v2_s-637d8ceb.pth")


def test_resolution_order(tmp_path, monkeypatch):
    monkeypatch.setenv("RELATION_DETR_WEIGHTS_DIR", str(tmp_path))
    # 1. existing path wins untouched
    f = tmp_path / "direct.npz"
    f.write_bytes(b"")
    assert resolve_pretrained(str(f)) == str(f)
    # 2. registered-but-uncached carries the URL + conversion command
    with pytest.raises(FileNotFoundError) as ei:
        resolve_pretrained("resnet50")
    assert "resnet50-11ad3fa6.pth" in str(ei.value)
    assert "convert_torch_weights" in str(ei.value)
    # 3. cached under the default-weight key resolves through the arch alias
    (tmp_path / "resnet50_v2.npz").write_bytes(b"")
    assert resolve_pretrained("resnet50") == str(tmp_path / "resnet50_v2.npz")
    # 4. unknown names raise KeyError listing the registry
    with pytest.raises(KeyError):
        resolve_pretrained("definitely_not_registered")
