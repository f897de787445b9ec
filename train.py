"""Training CLI.

Public surface mirrors /root/reference/main.py:
    python train.py --config-file configs/train_config.py [--mixed-precision bf16]
Data parallelism comes from the device mesh (all local devices) instead of
`accelerate launch`.
"""
from __future__ import annotations

import argparse
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from relation_detr_tpu.losses.criterion import CriterionConfig
from relation_detr_tpu.parallel.mesh import create_mesh, shard_batch
from relation_detr_tpu.parallel.train_step import (
    create_train_state,
    make_train_step,
)
from relation_detr_tpu.utils.checkpoint import CheckpointManager, save_weights
from relation_detr_tpu.utils.config import Config
from relation_detr_tpu.utils.logging import MetricLogger, setup_logger
from relation_detr_tpu.utils.param_groups import (
    build_optimizer,
    warmup_multistep_schedule,
)


def parse_args():
    p = argparse.ArgumentParser("relation_detr_tpu training")
    p.add_argument("--config-file", default="configs/train_config.py")
    p.add_argument("--model-config", default=None, help="override cfg.model_path")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--num-epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None, help="per-chip batch size")
    p.add_argument("--resume", default=None,
                   help="checkpoint directory = resume training (the run's "
                        "own output dir, its checkpoints/ subdir, or any "
                        "other run's); weight FILE (.npz) = load pretrained "
                        "weights and fine-tune — reference main.py:143-166 "
                        "semantics")
    p.add_argument("--clamp-check", default="auto", choices=("auto", "on", "off"),
                   help="measure the loaded checkpoint's tiled-MSDA clamp "
                        "fraction on the first batch before training (train"
                        "ing on clamped halos bakes the clamp into the "
                        "gradients); errors past --clamp-threshold if "
                        "--msda-halos was forced")
    p.add_argument("--clamp-threshold", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--canvas", default="800,1344",
                   help="fixed train canvas 'h,w', or 'buckets' for "
                        "aspect-ratio-grouped canvas buckets (one compile per bucket)")
    p.add_argument("--max-steps", type=int, default=None, help="debug: stop early")
    p.add_argument("--accumulate-steps", type=int, default=1)
    p.add_argument("--save-every-epochs", type=int, default=1,
                   help="checkpoint every N epochs (the last epoch always saves)")
    p.add_argument("--eval-every-epochs", type=int, default=0,
                   help="run COCO eval every N epochs (0 = off); tracks best AP")
    p.add_argument("--tensorboard", action="store_true", help="log to <output>/tb")
    p.add_argument("--profile-steps", default=None,
                   help="START,STOP step range to capture a jax profiler trace")
    p.add_argument("--mixed-precision", default="no", choices=("no", "bf16"),
                   help="bf16 compute for backbone + transformer matmuls "
                        "(params stay fp32; MSDA core/softmax/loss stay fp32 "
                        "— the reference's AMP islands, main.py:28-35)")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="keep an exponential moving average of the params "
                        "(ema = d*ema + (1-d)*params each step, reference "
                        "util/utils.py:272-282) and save it as "
                        "latest_ema.npz; 0 disables (the reference default "
                        "— its EMA class is likewise opt-in)")
    p.add_argument("--remat-policy", default=None,
                   choices=(None, "none", "dots", "dots_no_batch", "save_all"),
                   help="rematerialization policy for transformer layers; "
                        "'dots' saves matmul outputs (recommended with "
                        "--mixed-precision bf16: cast chains feeding dots "
                        "don't re-run in the backward sweep)")
    p.add_argument("--msda-impl", default=None,
                   help="MSDA kernel override (auto|corner_pack|gather|...)")
    p.add_argument("--msda-halos", default=None,
                   help="per-level tiled-kernel halo radii, comma-separated "
                        "(e.g. 4,3,2,2 = measured fast profile) or 'auto' "
                        "(default: num_points+1 per level, exact at the "
                        "reference offset init)")
    p.add_argument("--msda-dtype", default=None,
                   choices=("auto", "fp32", "bf16"),
                   help="dtype the tiled MSDA A-matrix/patch contraction is "
                        "built in (default auto = bf16 on TPU, fp32 on CPU: "
                        "the MXU rounds f32 dot operands to bf16 anyway — "
                        "measured bitwise-identical, PERF.md round 3e — so "
                        "bf16 only halves A traffic; fp32 forces a "
                        "fp32-built A for calibration)")
    return p.parse_args()


def main():
    args = parse_args()
    from relation_detr_tpu.ops.msda import apply_msda_cli_flags
    from relation_detr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    apply_msda_cli_flags(args)
    cfg = Config(args.config_file)
    model_cfg = Config(args.model_config or cfg.model_path)

    model = model_cfg.model
    criterion_cfg: CriterionConfig = model_cfg.criterion
    if args.mixed_precision == "bf16":
        model = model.clone(
            backbone_dtype="bfloat16", compute_dtype="bfloat16"
        )
        if args.remat_policy is None:
            # bf16 under full remat re-runs cast chains in the backward
            # sweep (measured 31.9 s/step vs 358 ms with dots — PERF.md);
            # never let the default be the pathological combination
            args.remat_policy = "dots"
    if args.remat_policy and args.remat_policy != "none":
        model = model.clone(remat_policy=args.remat_policy)

    # multi-host: initialize the jax distributed runtime when launched under
    # a multi-process coordinator (replaces init_distributed_mode,
    # /root/reference/util/utils.py:330-355)
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    name = os.path.splitext(os.path.basename(args.model_config or cfg.model_path))[0]
    output_dir = args.output_dir or cfg.get("output_dir") or f"checkpoints/{name}"
    logger = setup_logger(output=os.path.join(output_dir, "train.log"))
    from relation_detr_tpu.utils.collect_env import collect_env_info

    logger.info("environment:\n" + collect_env_info())

    mesh = create_mesh()
    n_chips = len(jax.devices())
    per_chip = args.batch_size or cfg.batch_size
    global_batch = per_chip * n_chips
    num_epochs = args.num_epochs or cfg.num_epochs
    bucketed = args.canvas == "buckets"
    canvas = (800, 1344) if bucketed else tuple(int(x) for x in args.canvas.split(","))

    dataset = cfg.train_dataset()
    from relation_detr_tpu.data.loader import DataLoader

    loader = DataLoader(
        dataset,
        batch_size=global_batch,
        shuffle=True,
        seed=args.seed,
        num_workers=cfg.get("num_workers", 4),
        fixed_canvas=None if bucketed else canvas,
        aspect_ratio_group_factor=3 if bucketed else -1,
        drop_last=True,
    )
    steps_per_epoch = len(loader)
    logger.info(f"{len(dataset)} images, {steps_per_epoch} steps/epoch, "
                f"global batch {global_batch}")

    schedule = warmup_multistep_schedule(
        cfg.learning_rate,
        steps_per_epoch,
        milestones_epochs=cfg.get("lr_milestones", (10,)),
        gamma=cfg.get("lr_gamma", 0.1),
    )
    tx = build_optimizer(
        schedule,
        weight_decay=cfg.get("weight_decay", 1e-4),
        betas=cfg.get("betas", (0.9, 0.999)),
        max_norm=cfg.get("max_norm", 0.1),
        accumulate_steps=args.accumulate_steps,
    )

    # init params on a dummy batch
    rng = jax.random.key(args.seed)
    dummy = {
        "images": jnp.zeros((global_batch, *canvas, 3), jnp.float32),
        "mask": jnp.zeros((global_batch, *canvas), bool),
        "gt_labels": jnp.zeros((global_batch, loader.max_gt), jnp.int32),
        "gt_boxes": jnp.full((global_batch, loader.max_gt, 4), 0.5, jnp.float32),
        "gt_valid": jnp.zeros((global_batch, loader.max_gt), bool),
    }
    variables = jax.jit(
        lambda: model.init(
            {"params": rng, "denoising": rng},
            dummy["images"], dummy["mask"], dummy["gt_labels"],
            dummy["gt_boxes"], dummy["gt_valid"], train=True,
        )
    )()
    n_params = sum(x.size for x in jax.tree.leaves(variables))
    logger.info(f"model params: {n_params / 1e6:.1f}M")

    resume_from = args.resume or cfg.get("resume_from_checkpoint")
    loaded_weights = False
    if resume_from and isinstance(resume_from, str) and os.path.isfile(resume_from):
        # weight FILE = load pretrained and fine-tune (reference
        # main.py:143-148: an isfile resume_from goes through
        # load_state_dict, not accelerator.load_state)
        from relation_detr_tpu.utils.checkpoint import load_weights

        variables = load_weights(resume_from, dict(variables))
        logger.info(f"loaded pretrained weights from {resume_from}")
        loaded_weights = True
        resume_from = None

    state = create_train_state(variables, tx, mesh)
    ckpt = CheckpointManager(os.path.join(output_dir, "checkpoints"))
    start_epoch = cfg.get("starting_epoch", 0)
    if resume_from:
        # `--resume PATH` restores from PATH (reference main.py:160-166:
        # resume names any checkpoint dir, not just this run's); a bare
        # truthy config flag restores from the run's own checkpoints.
        src = ckpt
        if isinstance(resume_from, str) and os.path.isdir(resume_from):
            cand = os.path.join(resume_from, "checkpoints")
            src = CheckpointManager(cand if os.path.isdir(cand) else resume_from)
        state = src.restore(state)
        start_epoch = int(src.latest_epoch()) + 1
        loaded_weights = True
        logger.info(
            f"resumed from epoch {start_epoch - 1} ({src.directory})"
        )

    if loaded_weights and args.clamp_check != "off":
        # training on halos that clamp this checkpoint's offsets bakes the
        # clamp into the gradients — the worst silent-wrongness case, so the
        # guard covers the train loads too (not just test.py). One captured
        # forward on the first batch's first image; errors when the user
        # forced clamping halos (utils/clamp_check.py semantics).
        from relation_detr_tpu.utils.clamp_check import check_checkpoint_clamp

        first = next(iter(loader), None)
        if first is not None:
            check_checkpoint_clamp(
                model,
                {"params": state.params, "batch_stats": state.batch_stats},
                first["images"][:1], first["mask"][:1],
                threshold=args.clamp_threshold,
                halos_forced=bool(args.msda_halos) and args.msda_halos != "auto",
                force=args.clamp_check == "on",
            )

    step_fn = make_train_step(
        model, criterion_cfg, tx, mesh,
        hybrid_assign=model_cfg.get("hybrid_assign", 6),
    )

    tb_writer = None
    if args.tensorboard:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(os.path.join(output_dir, "tb"))
    profile_range = None
    if args.profile_steps:
        profile_range = tuple(int(x) for x in args.profile_steps.split(","))

    from relation_detr_tpu.data.loader import device_prefetch

    def check_divergence(metrics, host=None):
        # non-finite steps are skipped in-graph (train_step.py) so no
        # garbage update is ever applied; abort with the exact step id
        if int(metrics["nonfinite_count"]) > 0:
            raise RuntimeError(
                f"non-finite loss first hit at step "
                f"{int(metrics['first_nonfinite_step'])} "
                f"({int(metrics['nonfinite_count'])} skipped)"
                + (f"; latest metrics: {host}" if host else "")
            )

    ema_params, ema_step = None, None
    if args.ema_decay > 0.0:
        from relation_detr_tpu.utils.ema import ema_init, ema_update

        ema_params = ema_init(state.params)
        ema_step = jax.jit(
            lambda e, p: ema_update(e, p, args.ema_decay), donate_argnums=0
        )

    batch_keys = ("images", "mask", "gt_labels", "gt_boxes", "gt_valid")
    global_step = 0
    prev_metrics = None
    for epoch in range(start_epoch, num_epochs):
        metric = MetricLogger(print_freq=cfg.get("print_freq", 50), logger=logger)
        for device_batch in metric.log_every(
            device_prefetch(loader, mesh, keys=batch_keys), f"epoch {epoch}"
        ):
            if profile_range and global_step == profile_range[0]:
                jax.profiler.start_trace(os.path.join(output_dir, "profile"))
            state, metrics = step_fn(state, device_batch, rng)
            # EMA tracks OPTIMIZER steps, not micro-steps: with gradient
            # accumulation params only move every k micro-steps, so updating
            # each micro-step would silently change the decay to decay^k
            # vs the reference's EMA-per-optimizer-step semantics.
            if ema_step is not None and (
                global_step + 1
            ) % args.accumulate_steps == 0:
                ema_params = ema_step(ema_params, state.params)
            global_step += 1
            # per-step divergence stop: check the PREVIOUS step's counter
            # after dispatching this one — its value is already materialized
            # on device, so the fetch overlaps the in-flight step instead of
            # serializing (a diverged run wastes at most one extra step).
            if prev_metrics is not None:
                check_divergence(prev_metrics)
            prev_metrics = metrics
            if profile_range and global_step == profile_range[1]:
                jax.profiler.stop_trace()
                logger.info(f"profiler trace written to {output_dir}/profile")
            if global_step % cfg.get("print_freq", 50) == 0:
                host = {k: float(v) for k, v in metrics.items()
                        if k in ("total_loss", "grad_norm", "loss_class", "loss_bbox", "loss_giou")}
                check_divergence(metrics, host)
                if not math.isfinite(host["total_loss"]):
                    raise RuntimeError(f"non-finite loss at step {global_step}: {host}")
                metric.update(**host)
                if tb_writer is not None:
                    for k, v in metrics.items():
                        tb_writer.add_scalar(f"train/{k}", float(v), global_step)
            if args.max_steps and global_step >= args.max_steps:
                logger.info("max steps reached")
                break
        stop_now = bool(args.max_steps and global_step >= args.max_steps)
        if args.eval_every_epochs and (
            (epoch + 1) % args.eval_every_epochs == 0 or epoch == num_epochs - 1
        ):
            # in-training COCO eval + best-AP checkpoints
            # (engine.py evaluate_acc + HighestCheckpoint, utils.py:250-269)
            from relation_detr_tpu.utils.evaluation import evaluate_model

            variables_now = {"params": state.params, "batch_stats": state.batch_stats}
            stats = evaluate_model(
                model, variables_now, cfg.test_dataset(), cfg.test_ann_file,
                batch_size=cfg.get("eval_batch_size", 1),
                # pin eval canvases: on axon every new adaptive bucket costs a
                # multi-minute compile inside the training loop; these three
                # cover nearly all of COCO val at the 800/1333 eval resize
                buckets=cfg.get(
                    "eval_buckets", ((800, 1184), (800, 1344), (1344, 800))
                ),
                topk=model_cfg.get("select_box_nums_for_evaluation", 300),
                verbose=False,
            )
            logger.info(
                f"epoch {epoch} eval: AP {stats['AP']:.4f} AP50 {stats['AP50']:.4f}"
            )
            if tb_writer is not None:
                for k, v in stats.items():
                    tb_writer.add_scalar(f"val/{k}", v, global_step)
            improved = ckpt.update_best(stats["AP"], stats["AP50"])
            if improved["ap"]:
                save_weights(os.path.join(output_dir, "best_ap.npz"), variables_now)
            if improved["ap50"]:
                save_weights(os.path.join(output_dir, "best_ap50.npz"), variables_now)
        if (
            (epoch + 1) % args.save_every_epochs == 0
            or epoch == num_epochs - 1
            or stop_now
        ):
            ckpt.save(epoch, state)
            weights = {"params": state.params, "batch_stats": state.batch_stats}
            class_names = cfg.get("class_names")
            if class_names:  # class names ride in the checkpoint (misc.py:198-232)
                from relation_detr_tpu.utils.class_names import encode_labels

                weights["_classes_"] = encode_labels(class_names)
            save_weights(os.path.join(output_dir, "latest.npz"), weights)
            if ema_params is not None:
                save_weights(
                    os.path.join(output_dir, "latest_ema.npz"),
                    {"params": ema_params, "batch_stats": state.batch_stats},
                )
        if stop_now:
            break
    if prev_metrics is not None:  # the final step was never cross-checked
        check_divergence(prev_metrics)
    logger.info("training done")


if __name__ == "__main__":
    main()
