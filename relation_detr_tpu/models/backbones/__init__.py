from relation_detr_tpu.models.backbones.resnet import ResNetBackbone

__all__ = ["ResNetBackbone"]
