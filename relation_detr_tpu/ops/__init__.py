from relation_detr_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    box_iou,
    generalized_box_iou,
    inverse_sigmoid,
)
from relation_detr_tpu.ops.msda import multi_scale_deformable_attention
from relation_detr_tpu.ops.hungarian import hungarian_assignment

__all__ = [
    "box_cxcywh_to_xyxy",
    "box_xyxy_to_cxcywh",
    "box_iou",
    "generalized_box_iou",
    "inverse_sigmoid",
    "multi_scale_deformable_attention",
    "hungarian_assignment",
]
