"""Conditional-imitation (CIL/CILRS) training — the reference's second
perception pathway (Models/cil_trainer.py + train_cil.py; BASELINE config 5
'CIL perception pretraining').

Trains a command-branched control regressor (models/cil.CilrsNet or
CarlaNet) on the same collected dataset: per-branch L1/MSE on (steer,
throttle, brake) masked by the sample's command, plus a speed-prediction
head (the CILRS speed regularizer).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cadre_tpu.configs.danet_config import PerceptionTrainParams
from cadre_tpu.utils import checkpoint as ckpt
from cadre_tpu.utils.logger import logger


@dataclasses.dataclass
class CILState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0


def cil_loss(controls_pred, speed_pred, batch, speed_weight: float = 0.05):
    """Branch-masked control regression + speed head (cil_trainer.py role).

    controls_pred: [B, 3] (already command-selected); batch provides
    steer/throttle targets and normalized speed.
    """
    steer_l = jnp.mean((controls_pred[:, 0] - batch["steer"]) ** 2)
    throttle_l = jnp.mean((controls_pred[:, 1] - batch["throttle"]) ** 2)
    brake_target = jnp.zeros_like(batch["throttle"])  # expert brake rare
    brake_l = jnp.mean((controls_pred[:, 2] - brake_target) ** 2)
    speed_l = jnp.mean((speed_pred - batch["speed"][:, 0] / 9.0) ** 2)
    total = steer_l + throttle_l + brake_l + speed_weight * speed_l
    return total, {"steer": steer_l, "throttle": throttle_l,
                   "brake": brake_l, "speed": speed_l}


class CILTrainer:
    def __init__(self, model, tp: PerceptionTrainParams,
                 steps_per_epoch: int, rng: jax.Array,
                 image_hw=(144, 256), in_channels: int = 3):
        self.model = model
        self.tp = tp
        x = jnp.zeros((1, image_hw[0], image_hw[1], in_channels))
        speed = jnp.zeros((1, 1))
        variables = model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, x,
            speed, jnp.zeros((1,), jnp.int32), train=True)
        warmup = max(1, tp.warmup_epochs * steps_per_epoch)
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, tp.lr, warmup,
            max(warmup + 1, tp.max_epochs * steps_per_epoch))
        self.opt = optax.chain(optax.add_decayed_weights(tp.weight_decay),
                               optax.adam(schedule))
        self.state = CILState(variables["params"],
                              variables.get("batch_stats", {}),
                              self.opt.init(variables["params"]))
        self._train_step = jax.jit(self._train_step_impl)

    def _loss_fn(self, params, stats, batch, rng):
        out, mutated = self.model.apply(
            {"params": params, "batch_stats": stats},
            batch["camera_rgb"], batch["speed"], batch["command"],
            train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
        controls, speed_pred = out
        total, losses = cil_loss(controls, speed_pred, batch)
        return total, (losses, mutated["batch_stats"])

    def _train_step_impl(self, params, stats, opt_state, batch, rng):
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(params, stats, batch, rng)
        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, dict(losses, total=total)

    def train_step(self, batch: Dict[str, np.ndarray], rng) -> Dict[str, float]:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        p, s, o, losses = self._train_step(self.state.params,
                                           self.state.batch_stats,
                                           self.state.opt_state, batch, rng)
        self.state = CILState(p, s, o, self.state.step + 1)
        return {k: float(v) for k, v in losses.items()}

    def solve(self, loader, epochs: Optional[int] = None,
              work_dir: Optional[str] = None, save_interval: int = 5,
              rng: Optional[jax.Array] = None) -> Dict[str, float]:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        epochs = epochs or self.tp.max_epochs
        last: Dict[str, float] = {}
        for epoch in range(epochs):
            agg: Dict[str, float] = {}
            n = 0
            for batch in loader:
                rng, key = jax.random.split(rng)
                for k, v in self.train_step(batch, key).items():
                    agg[k] = agg.get(k, 0.0) + v
                n += 1
            last = {k: v / max(n, 1) for k, v in agg.items()}
            logger.log(f"cil epoch {epoch}: " + ", ".join(
                f"{k}={v:.4f}" for k, v in last.items()))
            if work_dir and (epoch % save_interval == 0
                             or epoch == epochs - 1):
                ckpt.save_pytree(
                    os.path.join(work_dir, f"cil_epoch{epoch}.msgpack"),
                    {"params": self.state.params,
                     "batch_stats": self.state.batch_stats})
        return last
