"""Deformable-DETR++ ResNet-50: two-stage Def-DETR with the relation bias.

Mirrors /root/reference/configs/deformable_detr_pp/def_detr_pp_resnet_800_1333.py:
no denoising, no hybrid, binary two-stage classification, focal class loss.
"""
from relation_detr_tpu.losses.criterion import CriterionConfig
from relation_detr_tpu.models.detector import RelationDETR

num_classes = 91
num_queries = 300

model = RelationDETR(
    num_classes=num_classes,
    num_queries=num_queries,
    encoder_memory_fusion=False,
    decoder_use_relation=True,
    with_hybrid=False,
    denoising=None,
    backbone_arch="resnet50",
)

criterion = CriterionConfig(
    num_classes=num_classes, class_loss_type="focal", two_stage_binary_cls=True
)

min_size = 800
max_size = 1333
select_box_nums_for_evaluation = 300
