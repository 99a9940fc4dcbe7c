"""Perception pretraining entry point (the reference's
`python carla_perception/train.py --config auto_danet`).

With --collect, first drives the rule-based expert through the simulator to
build the IL dataset (the role of statics/vae_agent.py), then trains.
"""
from __future__ import annotations

import argparse
import dataclasses
import os

import jax


def _train_distributed(args, loader, stats, holdout_paths, cfg, tp):
    """Data-parallel epoch loop over a device mesh — the reference's
    DDP + SyncBatchNorm multi-GPU launch (experiments_builder.py:81-101),
    as one shard_map program: batch sharded over `data`, grads pmean-ed,
    BN batch stats psum-ed cross-replica via the BN axis_name."""
    import time

    from cadre_tpu.parallel.mesh import make_mesh
    from cadre_tpu.parallel.perception_step import (
        make_distributed_perception_trainer,
    )
    from cadre_tpu.utils import checkpoint as ckpt
    from cadre_tpu.utils.logger import logger

    mesh = make_mesh(args.mesh_devices)
    n_dev = int(mesh.devices.size)
    if args.batch_size % n_dev:
        raise SystemExit(f"--batch-size {args.batch_size} must be divisible "
                         f"by the {n_dev}-device mesh")
    logger.log(f"perception mesh: {n_dev} devices, per-device batch "
               f"{args.batch_size // n_dev}")
    state, update, shard_batch = make_distributed_perception_trainer(
        cfg, tp, steps_per_epoch=max(1, len(loader)),
        rng=jax.random.PRNGKey(args.seed), mesh=mesh,
        seg_class_weight=stats.seg_class_weight,
        light_class_weight=stats.light_class_weight)
    os.makedirs(args.work_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs):
        t0 = time.time()
        agg, n = {}, 0
        for batch in loader:
            rng, key = jax.random.split(rng)
            state, losses = update(state, shard_batch(batch), key)
            for k, v in losses.items():     # lazy device adds, no fetch
                agg[k] = agg.get(k, 0.0) + v
            n += 1
        row = {k: float(v) / max(n, 1) for k, v in agg.items()}
        fps = n * loader.batch_size / max(time.time() - t0, 1e-9)
        logger.log(f"perception epoch {epoch} [mesh x{n_dev}]: " + ", ".join(
            f"{k}={v:.3f}" for k, v in row.items()) + f" ({fps:.0f} frames/s)")
        if epoch % args.save_interval == 0 or epoch == args.epochs - 1:
            ckpt.save_pytree(
                os.path.join(args.work_dir, f"net_epoch{epoch}.msgpack"),
                {"params": state["params"],
                 "batch_stats": state["batch_stats"]})
    if holdout_paths:
        # per-class holdout report through a single-device trainer seeded
        # with the mesh-trained weights (test_route.py protocol)
        from cadre_tpu.perception.data import PerceptionDataLoader
        from cadre_tpu.perception.trainer import PerceptionTrainer

        trainer = PerceptionTrainer(
            cfg, tp, steps_per_epoch=max(1, len(loader)),
            rng=jax.random.PRNGKey(args.seed))
        trainer.load(os.path.join(args.work_dir,
                                  f"net_epoch{args.epochs - 1}.msgpack"))
        holdout = PerceptionDataLoader(holdout_paths,
                                       batch_size=args.batch_size,
                                       seed=args.seed)
        rep = trainer.evaluate_per_class(holdout)
        logger.log("holdout summary: " + " ".join(
            f"{k}={rep[k]:.4f}" for k in sorted(rep)
            if isinstance(rep[k], float)))


def main():
    p = argparse.ArgumentParser(description="Train the DANet encoder")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--collect", type=int, default=0,
                   help="collect N expert frames into --data-dir first")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=48)
    p.add_argument("--work-dir", default="result/perception")
    p.add_argument("--save-interval", type=int, default=5)
    p.add_argument("--resume", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--small", action="store_true")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--packed", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="uint8 wire batches, unpacked on device (~7x less "
                        "host->device traffic)")
    p.add_argument("--cache", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="keep decompressed shards resident in host RAM")
    p.add_argument("--model", default="danet",
                   help="zoo model name: danet | vanilla_vae | beta_vae | "
                        "da_beta_vae | old_vae | oldv2_vae | unet | "
                        "att_unet | r2_unet | r2att_unet | nested_unet")
    p.add_argument("--balance", action="store_true",
                   help="class-balanced epoch resampling: oversample rare "
                        "light-state classes and walker-visible frames "
                        "(repeat cap 8x) on top of the per-class CE "
                        "weights — the collection-side half of the "
                        "reference's imbalance handling")
    p.add_argument("--holdout", action="store_true",
                   help="hold out the last shard(s) and report per-class "
                        "seg/light accuracy tables after training "
                        "(the reference's test_route.py protocol)")
    p.add_argument("--light-weight", type=float, default=0.1,
                   help="light-state CE coefficient "
                        "(PerceptionTrainParams.w_light_state; the "
                        "reference's 0.1, auto_trainer.py:267-298). At 0.1 "
                        "the latent bottleneck never learns light HUE "
                        "(red/yellow holdout acc 0.000 despite separable "
                        "pixels); the floors protocol uses O(100)")
    p.add_argument("--seg-boost", action="append", default=[],
                   metavar="CLS:FACTOR",
                   help="multiply the inverse-frequency seg class weight "
                        "of class CLS by FACTOR (repeatable). inv-freq "
                        "gives every class an equal share of the seg "
                        "gradient; tiny-object classes (walker=3) need "
                        "an extra boost to clear the 0.5 holdout floor")
    p.add_argument("--holdout-shards", type=int, default=1,
                   help="number of trailing shards to hold out (1 shard = "
                        "512 frames gives noisy per-class tables; 4 is "
                        "the floors-protocol setting)")
    p.add_argument("--camroute", action="store_true",
                   help="blank the route-raster input plane "
                        "(DANetParams.in_route_blank): train the "
                        "camera-route encoder, where route geometry is "
                        "only reachable through the camera")
    p.add_argument("--experiment", default=None,
                   help="named reference experiment (configs/experiments.py"
                        " EXPERIMENTS, e.g. auto_danet_exp50 for the CoPM"
                        " w/o-attention ablation); overrides --model and the"
                        " input/output modes")
    p.add_argument("--mesh", action="store_true",
                   help="data-parallel training over ALL visible devices "
                        "(shard_map + SyncBN-via-axis-psum — the reference's"
                        " DDP+SyncBatchNorm launch, "
                        "experiments_builder.py:81-101); DANet only")
    p.add_argument("--mesh-devices", type=int, default=None,
                   help="limit the mesh to the first N devices")
    args = p.parse_args()

    from cadre_tpu.configs.danet_config import (
        PerceptionTrainParams,
        danet_params,
    )
    from cadre_tpu.perception.data import (
        PerceptionDataLoader,
        collect_dataset,
        compute_stats,
    )
    from cadre_tpu.perception.trainer import PerceptionTrainer
    from cadre_tpu.utils.logger import setup_logger

    setup_logger(args.work_dir)

    if args.collect > 0:
        from cadre_tpu.envs.expert import OracleExpert
        from cadre_tpu.envs.sim_env import SimDrivingEnv

        # phase-balanced light cycle (red is 0.5 s of the 8.5 s RL cycle —
        # unbalanced labels starve the light head's red class), a slow
        # traffic mix so the expert closes in on cars for seg-class
        # support, and doubled walkers so walker seg pixels have enough
        # holdout support (round-3 walker class sat at .356)
        env = SimDrivingEnv(seed=args.seed, seq_length=2,
                            vehicle_num=(8, 8), randomize_weather=True,
                            light_times=(3.0, 3.0, 3.0),
                            npc_cruise=(1.5, 5.0))
        collect_dataset(env, OracleExpert(), args.collect, args.data_dir,
                        seed=args.seed)

    # with the packed wire format, augmentation runs on device instead
    # of in host numpy (PerceptionTrainer(device_augment=True))
    host_augment = args.augment and not args.packed
    all_paths = PerceptionDataLoader(args.data_dir,
                                     batch_size=args.batch_size).paths
    # split the holdout shard FIRST: class-weight stats and the LR
    # schedule's steps_per_epoch must come from the training shards only
    holdout_paths = None
    train_paths = all_paths
    if args.holdout and len(all_paths) > 1:
        k = min(args.holdout_shards, len(all_paths) - 1)
        holdout_paths, train_paths = all_paths[-k:], all_paths[:-k]
    loader = PerceptionDataLoader(train_paths, batch_size=args.batch_size,
                                  seed=args.seed, augment=host_augment,
                                  packed=args.packed,
                                  cache_in_memory=args.cache,
                                  balance=args.balance)
    stats = compute_stats(loader.paths)
    for spec in args.seg_boost:
        cls_s, fac_s = spec.split(":")
        w = stats.seg_class_weight.copy()
        w[int(cls_s)] *= float(fac_s)
        stats = dataclasses.replace(stats, seg_class_weight=w)
    small = dict(da_feature_channel=64, inter_att_dims=48, z_dims=32) \
        if args.small else {}
    if args.camroute:
        small["in_route_blank"] = True
    tp = PerceptionTrainParams(batch_size=args.batch_size,
                               max_epochs=args.epochs,
                               w_light_state=args.light_weight)
    if args.mesh:
        if args.experiment or args.model != "danet":
            raise SystemExit("--mesh supports the production DANet only")
        # the packed-uint8 wire is a single-device put; the mesh path
        # shards host-assembled unpacked batches instead
        loader = PerceptionDataLoader(train_paths,
                                      batch_size=args.batch_size,
                                      seed=args.seed,
                                      augment=args.augment,
                                      cache_in_memory=args.cache,
                                      balance=args.balance)
        _train_distributed(args, loader, stats, holdout_paths,
                           danet_params(**small), tp)
        return
    if args.experiment:
        from cadre_tpu.configs.experiments import build_experiment

        model, cfg = build_experiment(args.experiment, **small)
    else:
        from cadre_tpu.models.registry import adapt_config, build_model

        cfg = danet_params(**small)
        cfg = adapt_config(args.model, cfg)
        model = build_model(args.model, cfg)
    trainer = PerceptionTrainer(
        cfg, tp, steps_per_epoch=max(1, len(loader)),
        rng=jax.random.PRNGKey(args.seed),
        seg_class_weight=stats.seg_class_weight,
        light_class_weight=stats.light_class_weight,
        model=model, device_augment=args.augment and args.packed)
    if args.resume:
        trainer.load(args.resume)
    holdout = None
    if holdout_paths:
        # last shard held out for the test_route-style per-class report
        holdout = PerceptionDataLoader(
            holdout_paths, batch_size=args.batch_size, seed=args.seed)
    trainer.solve(loader, epochs=args.epochs, work_dir=args.work_dir,
                  save_interval=args.save_interval)
    if holdout is not None:
        import numpy as _np

        from cadre_tpu.utils.logger import logger

        rep = trainer.evaluate_per_class(holdout)
        for key in ("seg_per_class", "light_per_class"):
            if key in rep:
                logger.log(f"holdout {key}: " + " ".join(
                    f"{v:.3f}" for v in _np.asarray(rep[key])))
        logger.log("holdout summary: " + " ".join(
            f"{k}={rep[k]:.4f}" for k in sorted(rep)
            if isinstance(rep[k], float)))


if __name__ == "__main__":
    main()
