"""RelationDETR FocalNet-L (lrf, fl4) 800x1333.

Mirrors /root/reference/configs/relation_detr/relation_detr_focalnet_large_lrf_fl4_800_1333.py.
"""
from relation_detr_tpu.losses.criterion import CriterionConfig
from relation_detr_tpu.models.detector import RelationDETR

num_classes = 91
hybrid_assign = 6

model = RelationDETR(
    num_classes=num_classes,
    num_queries=900,
    hybrid_num_proposals=1500,
    denoising_nums=100,
    backbone_arch="focalnet_large_lrf_fl4",
)

criterion = CriterionConfig(num_classes=num_classes, class_loss_type="vari_focal")

min_size = 800
max_size = 1333
select_box_nums_for_evaluation = 300
