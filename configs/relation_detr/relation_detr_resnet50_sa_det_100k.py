"""RelationDETR R50 for SA-Det-100k (class-agnostic, 45.0 AP reference row).

Mirrors the class-agnostic protocol of /root/reference/README.md:74-77: all
categories collapse to a single foreground class; pair with
``CocoDetection(class_agnostic=True)`` in the train config.
"""
from relation_detr_tpu.losses.criterion import CriterionConfig
from relation_detr_tpu.models.detector import RelationDETR

num_classes = 2  # background slot + the single agnostic class (id 1)
hybrid_assign = 6

model = RelationDETR(
    num_classes=num_classes,
    num_queries=900,
    hybrid_num_proposals=1500,
    denoising_nums=100,
    backbone_arch="resnet50",
)

criterion = CriterionConfig(num_classes=num_classes, class_loss_type="vari_focal")

min_size = 800
max_size = 1333
select_box_nums_for_evaluation = 300
