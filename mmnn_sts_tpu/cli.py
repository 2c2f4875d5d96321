"""CLI entry point — flag-contract parity with /root/reference/main.py:897-1022.

    python -m mmnn_sts_tpu --images --preop --survival --blend --split
    python -m mmnn_sts_tpu --inference --images --preop --survival --bootstrap \
        --no_gradcam

Includes the SageMaker-style string-boolean mirrors (--use_images etc.,
main.py:910-916) and the same flag-combination asserts (main.py:949-951;
the reference's `args.train`/`args.test` assert references undefined flags —
the evident intent, "training is the default mode", is implemented).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def str_to_bool(arg: str) -> bool:
    if arg.lower() == "false":
        return False
    if arg.lower() == "true":
        return True
    raise ValueError(f"Unexpected value for boolean conversion: {arg}")


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mmnn_sts_tpu")
    p.add_argument("--preop", action="store_true",
                   help="Use dataset consisting of clinical features available preoperation")
    p.add_argument("--postop", action="store_true",
                   help="Use dataset consisting of clinical features available pre and post operation")
    p.add_argument("--radiomics", action="store_true",
                   help="Use dataset consisting of extracted radiomic features")
    p.add_argument("--images", action="store_true",
                   help="Use dataset consisting of image data")
    p.add_argument("--classification", action="store_true",
                   help="Binary classification for Survival & DM")
    p.add_argument("--survival", action="store_true",
                   help="Time to Event model for survival & DM")
    p.add_argument("--segmentation", action="store_true",
                   help="Perform tumor segmentation")
    p.add_argument("--lr_finder", action="store_true",
                   help="Run LR range test (Smith 2015)")
    p.add_argument("--no_gradcam", action="store_true",
                   help="Disable gradcam for inference")

    # SageMaker string-boolean mirrors
    p.add_argument("--use_images", type=str, default="false")
    p.add_argument("--use_preop", type=str, default="false")
    p.add_argument("--use_postop", type=str, default="false")
    p.add_argument("--classification_task", type=str, default="false")
    p.add_argument("--inference_task", type=str, default="false")
    p.add_argument("--survival_task", type=str, default="false")
    p.add_argument("--use_blend", type=str, default="false")

    p.add_argument("--weights", type=str,
                   default="./weights/DenseNet121_BHB-10K_yAwareContrastive.pth",
                   help="Path to pretrained weights")
    p.add_argument("--output_path", type=str, default=".",
                   help="Directory for storing outputs")
    p.add_argument("--inference", action="store_true",
                   help="Inference using test set")
    p.add_argument("--data_loc", type=str, help="path to clinical data")
    p.add_argument("--image_loc", type=str, help="path to image data")
    p.add_argument("--key_loc", type=str, help="path to patient key")
    p.add_argument("--rad_loc", type=str, help="path to radiomic features")
    p.add_argument("--epochs", type=int, default=None, help="Number of epochs")
    p.add_argument("--lr", type=float, default=None, help="Learning rate")
    p.add_argument("--split", action="store_true",
                   help="Create a new dataset split instead of loading uid files")
    p.add_argument("--train_uid_location", type=str, default=None)
    p.add_argument("--val_uid_location", type=str, default=None)
    p.add_argument("--config", type=str, default="./config.yaml")
    p.add_argument("--blend", action="store_true",
                   help="Use gradient blending (multimodal models only)")
    p.add_argument("--blend_update_interval", type=int, default=5)
    p.add_argument("--bootstrap", action="store_true", help="Bootstrap evaluation")
    p.add_argument("--resume", action="store_true",
                   help="Resume from the latest checkpoint (new capability)")
    p.add_argument("--export_path", type=str, default="",
                   help="Serialize the eval forward (weights baked in) to a "
                        "portable StableHLO serving artifact and exit "
                        "(new capability)")
    p.add_argument("--checkpoint_dir", type=str, default="",
                   help="Orbax checkpoint directory (new capability)")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    args.images = args.images or str_to_bool(args.use_images)
    args.classification = args.classification or str_to_bool(args.classification_task)
    args.inference = args.inference or str_to_bool(args.inference_task)
    args.survival = args.survival or str_to_bool(args.survival_task)
    args.preop = args.preop or str_to_bool(args.use_preop)
    args.postop = args.postop or str_to_bool(args.use_postop)
    args.blend = args.blend or str_to_bool(args.use_blend)

    task_flags = [args.classification, args.survival, args.segmentation]
    assert not all(task_flags), (
        "Can only specify one of --classification , --survival , or --segmentation"
    )
    assert any(task_flags), (
        "Must specify one of --classification , --survival , or --segmentation"
    )
    if args.segmentation:
        # The reference accepts --segmentation but has no segmentation
        # training loop (its dataset class is also broken —
        # /root/reference/data/ImageDatasets.py:295-308); the aligned
        # (image, mask) cohort builder exists at
        # data/images.build_segmentation_cohort for downstream use.
        raise NotImplementedError(
            "segmentation training is not implemented (the reference has no "
            "segmentation loop either); use "
            "mmnn_sts_tpu.data.images.build_segmentation_cohort to load "
            "aligned image/mask cohorts"
        )

    # Heavy imports deferred so --help stays fast.
    import jax

    from .config import parse_config
    from .constants import SUPER_BATCH_SIZE
    from .models import build_model
    from .parallel.mesh import make_mesh, maybe_initialize_distributed, replicate
    from .pipeline import (
        TaskFlags,
        load_cohort,
        make_split_dataset,
        resolve_splits,
    )
    from .train import checkpoint as ckpt_lib
    from .train.loop import LoopConfig, train_classification, train_survival
    from .train.schedule import make_optimizer, steps_per_epoch
    from .train.state import create_train_state
    from .utils.logging import get_logger

    logger = get_logger()

    cfg = parse_config(args.config)
    # CLI overrides of config paths/hparams
    for cli_name, target in [
        ("data_loc", ("data", "data_loc")),
        ("image_loc", ("data", "image_loc")),
        ("key_loc", ("data", "key_loc")),
        ("rad_loc", ("data", "rad_loc")),
    ]:
        v = getattr(args, cli_name)
        if v:
            setattr(getattr(cfg, target[0]), target[1], v)
    if args.epochs is not None:
        cfg.hyperparameters.epochs = args.epochs
    if args.lr is not None:
        cfg.hyperparameters.learning_rate = args.lr
    if args.train_uid_location:
        cfg.preprocessing.train_uid_location = args.train_uid_location
    if args.val_uid_location:
        cfg.preprocessing.val_uid_location = args.val_uid_location

    if cfg.tpu.debug_nans:
        jax.config.update("jax_debug_nans", True)

    flags = TaskFlags(
        preop=args.preop,
        postop=args.postop,
        radiomics=args.radiomics,
        images=args.images,
        classification=args.classification,
        survival=args.survival,
        segmentation=args.segmentation,
        blend=args.blend and args.images and (args.preop or args.postop),
        split=args.split,
        inference=args.inference,
        bootstrap=args.bootstrap,
        no_gradcam=args.no_gradcam,
        lr_finder=args.lr_finder,
    )

    hp = cfg.hyperparameters
    os.makedirs(args.output_path, exist_ok=True)
    if maybe_initialize_distributed():
        logger.info(
            f"multi-host: process {jax.process_index()}/{jax.process_count()}"
        )
    logger.info(f"devices: {jax.devices()}")
    mesh = make_mesh(cfg.tpu.mesh_shape, tuple(cfg.tpu.mesh_axes))

    bundle = load_cohort(cfg, flags)
    train_uids, val_uids, test_uids = resolve_splits(cfg, flags, bundle, hp.seed)
    if cfg.clinical_model.standardize:
        from .pipeline import standardize_bundle

        standardize_bundle(bundle, train_uids)
        logger.info("standardized tabular predictors with train-split stats")

    # TrainState + optimizer
    train_ds = make_split_dataset(cfg, flags, bundle, train_uids, mesh)
    val_ds = make_split_dataset(cfg, flags, bundle, val_uids, mesh)
    num_tabular = (
        int(train_ds.inputs["clinical"].shape[-1])
        if "clinical" in train_ds.inputs
        else None
    )
    model = build_model(
        cfg, flags.images, flags.preop, flags.postop, flags.blend,
        num_tabular_inputs=num_tabular,
    )
    logger.info(
        f"Training count = {train_ds.num_samples} "
        f"Validation count = {val_ds.num_samples}"
    )

    step_batch = SUPER_BATCH_SIZE if flags.survival else hp.train_batch_size
    spe = steps_per_epoch(train_ds.num_samples, step_batch)
    tx = make_optimizer(hp.learning_rate, spe, hp.epochs, hp.momentum,
                        hp.weight_decay)
    sample = jax.tree.map(lambda x: x[:1], train_ds.model_inputs())
    state = create_train_state(model, tx, sample, seed=hp.seed)
    def _commit(st):
        # Commit the whole state replicated on the mesh only when actually
        # distributed; on a single chip committed-vs-uncommitted sharding
        # mismatches force a host round-trip of the state every step.
        # Replicating everything (incl. step/epoch/rng) keeps all leaves on
        # identical device sets — jit rejects mixed placements.
        if mesh.devices.size <= 1:
            return st
        return st.replace(
            step=replicate(mesh, st.step),
            epoch=replicate(mesh, st.epoch),
            params=replicate(mesh, st.params),
            batch_stats=replicate(mesh, st.batch_stats),
            opt_state=replicate(mesh, st.opt_state),
            blend=replicate(mesh, st.blend),
            rng=replicate(mesh, st.rng),
        )

    state = _commit(state)

    # Weight loading: trained weights for inference AND serving export
    # (an artifact bakes the params in as constants — exporting the
    # pretrained/random init would silently ship the wrong model),
    # pretrained otherwise
    weights_path = (hp.model_weights if (args.inference or args.export_path)
                    else hp.pretrained_weights) or args.weights
    if weights_path and os.path.exists(weights_path):
        try:
            if weights_path.endswith(".npz"):
                params, bs = ckpt_lib.load_params_npz(
                    weights_path, state.params, state.batch_stats
                )
                state = state.replace(params=params, batch_stats=bs)
                logger.info("Loaded weights from npz")
            elif weights_path.endswith(".pth"):
                tgt = state.params
                img_scope = "image_model" if flags.multimodal else None
                p = tgt[img_scope] if img_scope else tgt
                b = (state.batch_stats[img_scope] if img_scope
                     else state.batch_stats)
                new_p, new_b, n = ckpt_lib.import_bhb10k_backbone(
                    weights_path, p, b
                )
                if img_scope:
                    tgt = dict(tgt)
                    tgt[img_scope] = new_p
                    bs = dict(state.batch_stats)
                    bs[img_scope] = new_b
                else:
                    tgt, bs = new_p, new_b
                state = state.replace(params=tgt, batch_stats=bs)
                logger.info(f"Loaded pretrained backbone ({n} tensors)")
        except Exception as e:  # noqa: BLE001 — parity: warn + random init
            logger.error(
                f"Loading pretrained weights failed - continuing with "
                f"randomized weights ({e})"
            )

    loop_cfg = LoopConfig(
        epochs=hp.epochs,
        batch_size=hp.train_batch_size,
        blend=flags.blend,
        blend_update_interval=args.blend_update_interval,
        seed=hp.seed,
        output_dir=args.output_path,
        checkpoint_dir=args.checkpoint_dir,
        save_params_name=(
            "best_surv_model.npz" if flags.survival else "model.npz"
        ),
        profile_dir=cfg.tpu.profile_dir,
        ties=hp.cox_ties,
        eval_chunk=cfg.tpu.eval_chunk_size,
        fused_epoch=cfg.tpu.fused_epoch,
        microbatch_group=cfg.tpu.microbatch_group,
    )

    if args.resume and args.checkpoint_dir:
        mgr = ckpt_lib.CheckpointManager(args.checkpoint_dir)
        restored = mgr.restore(state)
        if restored is not None:
            state = _commit(restored)
            logger.info(f"Resumed from step {int(state.step)}")

    if args.lr_finder:
        from .train.lr_finder import find_lr

        find_lr(cfg, flags, bundle, mesh)
        return 0

    if args.export_path:
        from .infer.export import export_forward

        ds = make_split_dataset(cfg, flags, bundle, test_uids or val_uids,
                                mesh)
        sample = ds.model_inputs(idx=slice(0, 1))
        # eval_transform preprocessing applies to the image stream only;
        # clinical-only models serve raw features (reference main.py:86-92).
        export_forward(state, sample, blend=flags.blend,
                       preprocess=flags.images, path=args.export_path)
        logger.info(f"Exported serving artifact to {args.export_path}")
        return 0

    if args.inference:
        from .infer.run import (
            InferenceConfig,
            inference_classification,
            inference_survival,
        )

        test_ds = make_split_dataset(
            cfg, flags, bundle, test_uids or val_uids, mesh
        )
        icfg = InferenceConfig(
            blend=flags.blend,
            bootstrap=args.bootstrap,
            gradcam=(not args.no_gradcam) and flags.images,
            output_dir=args.output_path,
            seed=hp.seed,
            eval_chunk=cfg.tpu.eval_chunk_size,
            bucket=cfg.data.bucket,
            dest_prefix=cfg.preprocessing.output_dir,
            ties=hp.cox_ties,
        )
        if flags.survival:
            inference_survival(state, test_ds, icfg)
        else:
            inference_classification(state, test_ds, icfg)
        return 0

    if flags.survival:
        train_survival(state, train_ds, val_ds, loop_cfg)
    else:
        train_classification(state, train_ds, val_ds, loop_cfg)

    if cfg.data.bucket:
        # post-training artifact upload (reference main.py:365-383);
        # best-effort, swallowed failures
        from .utils.store import train_artifact_names, upload_artifacts

        upload_artifacts(
            cfg.data.bucket,
            args.output_path,
            train_artifact_names(flags.survival, flags.blend),
            cfg.preprocessing.output_dir,
        )
    return 0
