"""Training run configuration.

Mirrors /root/reference/configs/train_config.py: run hyperparameters plus
dataset factories. Dataset construction is deferred to callables so importing
the config stays cheap.
"""
from relation_detr_tpu.data import transforms
from relation_detr_tpu.data.coco import CocoDetection

num_epochs = 12
batch_size = 2  # per chip
num_workers = 4
print_freq = 50
starting_epoch = 0
max_norm = 0.1

output_dir = None  # default: checkpoints/{model_name}

coco_path = "data/coco"


def train_dataset():
    return CocoDetection(
        img_folder=f"{coco_path}/train2017",
        ann_file=f"{coco_path}/annotations/instances_train2017.json",
        transforms=transforms.detr(),
        train=True,
    )


def test_dataset():
    return CocoDetection(
        img_folder=f"{coco_path}/val2017",
        ann_file=f"{coco_path}/annotations/instances_val2017.json",
        transforms=transforms.eval_800_1333(),
    )


test_ann_file = f"{coco_path}/annotations/instances_val2017.json"

model_path = "configs/relation_detr/relation_detr_resnet50_800_1333.py"

resume_from_checkpoint = None

learning_rate = 1e-4
weight_decay = 1e-4
betas = (0.9, 0.999)
lr_milestones = (10,)  # epochs
lr_gamma = 0.1
