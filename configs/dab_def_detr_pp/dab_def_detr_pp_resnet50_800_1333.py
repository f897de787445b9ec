"""DAB-Def-DETR++ ResNet-50: two-stage with memory-gathered content queries.

Mirrors /root/reference/configs/dab_def_detr_pp/dab_def_detr_pp_resnet50_800_1333.py.
"""
from relation_detr_tpu.losses.criterion import CriterionConfig
from relation_detr_tpu.models.detector import RelationDETR

num_classes = 91
num_queries = 300

model = RelationDETR(
    num_classes=num_classes,
    num_queries=num_queries,
    query_source="memory",
    encoder_memory_fusion=False,
    decoder_use_relation=True,
    with_hybrid=False,
    denoising=None,
    backbone_arch="resnet50",
)

criterion = CriterionConfig(num_classes=num_classes, class_loss_type="focal")

min_size = 800
max_size = 1333
select_box_nums_for_evaluation = 300
