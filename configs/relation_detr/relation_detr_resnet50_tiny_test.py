"""Tiny RelationDETR for smoke tests / CI (shallow stack, few queries)."""
from relation_detr_tpu.losses.criterion import CriterionConfig
from relation_detr_tpu.models.detector import RelationDETR

num_classes = 4  # synthetic: ids 1..3 + 0
hybrid_assign = 6

model = RelationDETR(
    num_classes=num_classes,
    num_queries=60,
    hybrid_num_proposals=90,
    denoising_nums=5,
    transformer_enc_layers=1,
    transformer_dec_layers=2,
    backbone_arch="resnet18",
)

criterion = CriterionConfig(num_classes=num_classes)

min_size = 224
max_size = 320
select_box_nums_for_evaluation = 30
