"""CIL/CILRS baseline training entry (the reference's
`python carla_perception/train_cil.py`)."""
from __future__ import annotations

import argparse

import jax


def main():
    p = argparse.ArgumentParser(description="Train a CIL/CILRS baseline")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--collect", type=int, default=0)
    p.add_argument("--model", default="cilrs", choices=["cilrs", "carla"])
    p.add_argument("--arch", default="resnet18")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=48)
    p.add_argument("--work-dir", default="result/cil")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from cadre_tpu.configs.danet_config import PerceptionTrainParams
    from cadre_tpu.models.cil import CarlaNet, CilrsNet
    from cadre_tpu.perception.cil_trainer import CILTrainer
    from cadre_tpu.perception.data import PerceptionDataLoader, collect_dataset
    from cadre_tpu.utils.logger import setup_logger

    setup_logger(args.work_dir)
    if args.collect > 0:
        from cadre_tpu.envs.expert import OracleExpert
        from cadre_tpu.envs.sim_env import SimDrivingEnv

        env = SimDrivingEnv(seed=args.seed, seq_length=2, vehicle_num=(8, 4))
        collect_dataset(env, OracleExpert(), args.collect, args.data_dir,
                        seed=args.seed)

    loader = PerceptionDataLoader(args.data_dir, batch_size=args.batch_size,
                                  seed=args.seed)
    model = CilrsNet(arch=args.arch) if args.model == "cilrs" else CarlaNet()
    tp = PerceptionTrainParams(batch_size=args.batch_size,
                               max_epochs=args.epochs)
    trainer = CILTrainer(model, tp, steps_per_epoch=max(1, len(loader)),
                         rng=jax.random.PRNGKey(args.seed))
    trainer.solve(loader, epochs=args.epochs, work_dir=args.work_dir)


if __name__ == "__main__":
    main()
