"""DINO++ ResNet-50: DINO enhanced with the position-relation decoder bias.

Mirrors /root/reference/configs/dino_pp/dino_pp_resnet50_800_1333.py: plain
encoder (no memory fusion), CDN denoising, no hybrid branch, focal class loss.
"""
from relation_detr_tpu.losses.criterion import CriterionConfig
from relation_detr_tpu.models.detector import RelationDETR

num_classes = 91
num_queries = 900

model = RelationDETR(
    num_classes=num_classes,
    num_queries=num_queries,
    denoising_nums=100,
    encoder_memory_fusion=False,
    decoder_use_relation=True,
    with_hybrid=False,
    denoising="cdn",
    backbone_arch="resnet50",
)

criterion = CriterionConfig(num_classes=num_classes, class_loss_type="focal")

min_size = 800
max_size = 1333
select_box_nums_for_evaluation = 300
