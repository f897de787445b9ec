from relation_detr_tpu.models.backbones.convnext import ConvNeXtBackbone
from relation_detr_tpu.models.backbones.focalnet import FocalNetBackbone
from relation_detr_tpu.models.backbones.resnet import ResNetBackbone
from relation_detr_tpu.models.backbones.swin import SwinTransformerBackbone
from relation_detr_tpu.models.backbones.vit import VisionTransformerBackbone


def build_backbone(arch: str, name: str = "backbone", dtype=None, **kwargs):
    """Backbone factory keyed by arch string (mirrors the reference's
    per-family BaseBackbone.__new__ factories). ``dtype`` selects the compute
    dtype for backbones that support it (params stay fp32); extra kwargs pass
    through to the backbone module (e.g. ``stage_with_dcn`` for the DCN
    ResNet variant, reference resnet.py:188-193)."""
    if arch.startswith(("resnet", "resnext", "wide_resnet")):
        return ResNetBackbone(arch=arch, dtype=dtype, name=name, **kwargs)
    if arch.startswith("swin"):
        return SwinTransformerBackbone(arch=arch, name=name)
    if arch.startswith("focalnet"):
        return FocalNetBackbone(arch=arch, name=name)
    if arch.startswith("convnext"):
        return ConvNeXtBackbone(arch=arch, name=name)
    if arch.startswith(("vit", "eva_02_vit")):
        return VisionTransformerBackbone(arch=arch, name=name)
    raise ValueError(f"unknown backbone arch: {arch}")


__all__ = [
    "ResNetBackbone",
    "SwinTransformerBackbone",
    "FocalNetBackbone",
    "ConvNeXtBackbone",
    "VisionTransformerBackbone",
    "build_backbone",
]
