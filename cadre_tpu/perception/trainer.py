"""Perception pretraining: jitted multi-task train/eval steps + epoch loop.

Contract (Models/auto_trainer.py + experiments_builder.py):
  - Adam lr 1e-4 betas (0.9, 0.999) weight_decay 5e-4, cosine LR over
    max_epochs with linear warmup (Config/auto_danet.py:173-179 + warmUpLR)
  - multi-task weighted loss (losses.total_danet_loss)
  - checkpoints net_epoch{N}/optim_epoch{N} every save_interval epochs
    (experiments_builder.py:442-473); strict-load resume
  - test pass accumulating per-head losses + seg/light accuracies
    (auto_trainer.py:656+)

TPU-first: one jitted train_step (forward + loss + grads + BN-stat update +
optimizer) — optionally shard_mapped over a `data` mesh axis with psum-mean
grads and cross-replica BN (the reference's DDP+SyncBN equivalent,
experiments_builder.py:81-101).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cadre_tpu.configs.danet_config import DANetParams, PerceptionTrainParams
from cadre_tpu.models.danet import DANet, create_danet
from cadre_tpu.perception.data import unpack_batch
from cadre_tpu.perception.losses import total_danet_loss
from cadre_tpu.utils import checkpoint as ckpt
from cadre_tpu.utils.logger import logger


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0


def make_optimizer(tp: PerceptionTrainParams, steps_per_epoch: int
                   ) -> optax.GradientTransformation:
    warmup = max(1, tp.warmup_epochs * steps_per_epoch)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tp.lr,
        warmup_steps=warmup,
        decay_steps=max(warmup + 1, tp.max_epochs * steps_per_epoch),
        end_value=0.0,
    )
    # torch Adam(weight_decay) = L2 added to grads before the moments
    return optax.chain(
        optax.add_decayed_weights(tp.weight_decay),
        optax.adam(schedule, b1=tp.betas[0], b2=tp.betas[1]),
    )


class PerceptionTrainer:
    def __init__(self, cfg: DANetParams, tp: PerceptionTrainParams,
                 steps_per_epoch: int, rng: jax.Array,
                 seg_class_weight: Optional[np.ndarray] = None,
                 light_class_weight: Optional[np.ndarray] = None,
                 axis_name: Optional[str] = None,
                 dtype: Any = jnp.float32,
                 model: Any = None,
                 device_augment: bool = False):
        """`model`: any flax module with the DANet forward contract
        (x, bc_speed?, train) -> heads dict — the zoo models
        (VanillaVAE/BetaVAE/DABetaVAE) plug in here; default is DANet.

        `device_augment` applies the noise/pixel-dropout augmentation
        (auto_basic_config.py:56-61) to the rgb channels inside the jitted
        train step — the host-numpy version costs ~0.4 s/batch on a
        one-core host; on device it fuses into the input pipeline."""
        self.cfg = cfg
        self.tp = tp
        self.device_augment = device_augment
        if model is None:
            self.model, variables = create_danet(cfg, rng, train=True,
                                                 axis_name=axis_name)
            self._takes_speed = True
        else:
            self.model = model
            self._takes_speed = False
            x = jnp.zeros((1, cfg.image_height, cfg.image_width,
                           cfg.input_channel))
            variables = model.init(
                {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, x,
                train=True)
        self.opt = make_optimizer(tp, steps_per_epoch)
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.opt.init(variables["params"]),
        )
        self.seg_w = jnp.asarray(seg_class_weight) \
            if seg_class_weight is not None else None
        self.light_w = jnp.asarray(light_class_weight) \
            if light_class_weight is not None else None
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)
        self._per_class_fn = None

    # ---------------- steps ----------------

    def _apply(self, params, batch_stats, batch, train, rng=None):
        x = batch["x"]
        if getattr(self.cfg, "in_route_blank", False):
            from cadre_tpu.perception.data import blank_route_plane

            # camera-route experiment: the route raster stays a TARGET
            # (batch['route_fig']) but is blanked from the model input
            x = blank_route_plane(x)
        args = (x, batch["speed"]) if self._takes_speed else (x,)
        kwargs = dict(train=train)
        if train:
            kwargs["rngs"] = {"dropout": rng}
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats}, *args,
                mutable=["batch_stats"], **kwargs)
        return self.model.apply(
            {"params": params, "batch_stats": batch_stats}, *args, **kwargs)

    def _augment_on_device(self, batch, rng):
        """Noise + coarse pixel dropout on the rgb channels of x
        (auto_basic_config.py:56-61; recon/seg targets stay clean)."""
        x = batch["x"]
        rgb = x[..., :3]
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 1))
        rgb = rgb + jax.random.normal(k1, rgb.shape) * (4.0 / 255.0)
        keep = jax.random.uniform(k2, rgb.shape[:3] + (1,)) > 0.05
        rgb = jnp.clip(rgb * keep, 0.0, 1.0)
        return dict(batch, x=jnp.concatenate([rgb, x[..., 3:]], axis=-1))

    def _loss_fn(self, params, batch_stats, batch, rng):
        batch = unpack_batch(batch)   # no-op unless packed wire format
        if self.device_augment:
            batch = self._augment_on_device(batch, rng)
        outputs, mutated = self._apply(params, batch_stats, batch, True, rng)
        total, losses = total_danet_loss(outputs, batch, self.cfg,
                                         self.seg_w, self.light_w,
                                         light_weight=self.tp.w_light_state)
        return total, (losses, mutated["batch_stats"])

    def _train_step_impl(self, state_params, state_stats, opt_state, batch,
                         rng):
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(state_params, state_stats, batch,
                                         rng)
        updates, opt_state = self.opt.update(grads, opt_state, state_params)
        params = optax.apply_updates(state_params, updates)
        losses = dict(losses, total=total)
        return params, new_stats, opt_state, losses

    def _eval_step_impl(self, params, batch_stats, batch):
        batch = unpack_batch(batch)
        outputs = self._apply(params, batch_stats, batch, False)
        total, losses = total_danet_loss(outputs, batch, self.cfg,
                                         self.seg_w, self.light_w,
                                         light_weight=self.tp.w_light_state)
        metrics = dict(losses, total=total)
        if self.cfg.pred_camera_seg:
            pred = jnp.argmax(outputs["camera"], axis=-1)
            metrics["seg_accuracy"] = jnp.mean(
                (pred == batch["camera_seg"]).astype(jnp.float32))
        if self.cfg.pred_light_state:
            pred = jnp.argmax(outputs["light_state"], axis=-1)
            metrics["light_accuracy"] = jnp.mean(
                (pred == batch["light_state"]).astype(jnp.float32))
        return metrics

    def train_step(self, batch: Dict[str, np.ndarray], rng: jax.Array,
                   sync: bool = True) -> Dict[str, float]:
        """`sync=False` returns lazy device scalars instead of floats so the
        epoch loop never blocks on per-step host fetches (each fetch is a
        full round trip on a remote-TPU link)."""
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params, stats, opt_state, losses = self._train_step(
            self.state.params, self.state.batch_stats, self.state.opt_state,
            batch, rng)
        self.state = TrainState(params, stats, opt_state,
                                self.state.step + 1)
        if not sync:
            return losses
        return {k: float(v) for k, v in losses.items()}

    def eval_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return {k: float(v) for k, v in
                self._eval_step(self.state.params, self.state.batch_stats,
                                batch).items()}

    # ---------------- epoch loop ----------------

    def solve(self, loader, epochs: Optional[int] = None,
              work_dir: Optional[str] = None, save_interval: int = 5,
              rng: Optional[jax.Array] = None,
              eval_loader=None, prefetch: bool = True) -> Dict[str, float]:
        from cadre_tpu.rl.pipeline import DevicePrefetcher

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        epochs = epochs or self.tp.max_epochs
        last: Dict[str, float] = {}
        for epoch in range(epochs):
            t0 = time.time()
            agg: Dict[str, float] = {}
            n = 0
            batches = DevicePrefetcher(loader) if prefetch else loader
            for batch in batches:
                rng, key = jax.random.split(rng)
                losses = self.train_step(batch, key, sync=False)
                for k, v in losses.items():   # lazy device adds, no fetch
                    agg[k] = agg.get(k, 0.0) + v
                n += 1
            last = {k: float(v) / max(n, 1) for k, v in agg.items()}
            fps = n * loader.batch_size / max(time.time() - t0, 1e-9)
            logger.log(f"perception epoch {epoch}: " + ", ".join(
                f"{k}={v:.3f}" for k, v in last.items())
                + f" ({fps:.0f} frames/s)")
            if work_dir and (epoch % save_interval == 0
                             or epoch == epochs - 1):
                self.save(os.path.join(work_dir, f"net_epoch{epoch}.msgpack"))
            if eval_loader is not None:
                metrics = self.evaluate(eval_loader)
                logger.log(f"  eval: " + ", ".join(
                    f"{k}={v:.3f}" for k, v in metrics.items()))
                if work_dir:
                    self._dump_recon(eval_loader, work_dir, epoch)
        return last

    def _dump_recon(self, loader, work_dir: str, epoch: int) -> None:
        """recon_epoch{N}/ visualization grids (auto_trainer.py:112-265)."""
        from cadre_tpu.perception.visualize import dump_visualizations

        batch = next(iter(loader))
        jb = unpack_batch({k: jnp.asarray(v) for k, v in batch.items()})
        batch = jax.tree.map(np.asarray, jb)
        outputs = self._apply(self.state.params, self.state.batch_stats,
                              jb, False)
        dump_visualizations(batch, jax.tree.map(np.asarray, outputs),
                            work_dir, epoch)

    def evaluate(self, loader) -> Dict[str, float]:
        agg: Dict[str, float] = {}
        n = 0
        for batch in loader:
            m = self.eval_step(batch)
            for k, v in m.items():
                agg[k] = agg.get(k, 0.0) + v
            n += 1
        return {k: v / max(n, 1) for k, v in agg.items()}

    def evaluate_per_class(self, loader, num_seg_classes: int = 8,
                           num_light_classes: int = 4) -> Dict[str, Any]:
        """Held-out per-class accuracy tables — the reference's
        `test_route.py` protocol (Models/auto_trainer.py:656+ accumulates
        imgSeg/lightState accuracies per class over a held-out route).

        Returns {'seg_per_class': [C], 'seg_counts': [C],
                 'light_per_class': [L], 'light_counts': [L],
                 'seg_mean_class_acc', 'light_mean_class_acc',
                 'seg_pixel_acc', 'light_acc'}.
        """
        if self._per_class_fn is None:
            def counts(params, stats, batch):
                batch = unpack_batch(batch)
                outputs = self._apply(params, stats, batch, False)
                out: Dict[str, Any] = {}
                if self.cfg.pred_camera_seg:
                    pred = jnp.argmax(outputs["camera"], axis=-1)
                    true = batch["camera_seg"]
                    oh = jax.nn.one_hot(true, num_seg_classes)
                    hit = (pred == true)[..., None] * oh
                    out["seg_correct"] = hit.sum(axis=(0, 1, 2))
                    out["seg_total"] = oh.sum(axis=(0, 1, 2))
                if self.cfg.pred_light_state:
                    pred = jnp.argmax(outputs["light_state"], axis=-1)
                    true = batch["light_state"]
                    oh = jax.nn.one_hot(true, num_light_classes)
                    hit = (pred == true)[:, None] * oh
                    out["light_correct"] = hit.sum(axis=0)
                    out["light_total"] = oh.sum(axis=0)
                if getattr(self.cfg, "pred_route_geom", False):
                    true = jnp.stack([batch["dis"], batch["theta"]], axis=-1)
                    err = outputs["route_geom"] - true
                    out["geom_se"] = (err ** 2).sum(axis=0)
                    out["geom_sum"] = true.sum(axis=0)
                    out["geom_sumsq"] = (true ** 2).sum(axis=0)
                    out["geom_n"] = jnp.full((), true.shape[0], jnp.float32)
                return out

            self._per_class_fn = jax.jit(counts)

        agg: Dict[str, np.ndarray] = {}
        for batch in loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            c = self._per_class_fn(self.state.params,
                                   self.state.batch_stats, batch)
            for k, v in c.items():
                agg[k] = agg.get(k, 0.0) + np.asarray(v)
        report: Dict[str, Any] = {}
        if "seg_total" in agg:
            tot = np.maximum(agg["seg_total"], 1.0)
            per = agg["seg_correct"] / tot
            report["seg_per_class"] = per
            report["seg_counts"] = agg["seg_total"]
            seen = agg["seg_total"] > 0
            report["seg_mean_class_acc"] = float(per[seen].mean()) \
                if seen.any() else 0.0
            report["seg_pixel_acc"] = float(
                agg["seg_correct"].sum() / max(agg["seg_total"].sum(), 1.0))
        if "light_total" in agg:
            tot = np.maximum(agg["light_total"], 1.0)
            per = agg["light_correct"] / tot
            report["light_per_class"] = per
            report["light_counts"] = agg["light_total"]
            seen = agg["light_total"] > 0
            report["light_mean_class_acc"] = float(per[seen].mean()) \
                if seen.any() else 0.0
            report["light_acc"] = float(
                agg["light_correct"].sum()
                / max(agg["light_total"].sum(), 1.0))
        if "geom_se" in agg:
            n = max(float(agg["geom_n"]), 1.0)
            var = agg["geom_sumsq"] - agg["geom_sum"] ** 2 / n
            r2 = 1.0 - agg["geom_se"] / np.maximum(var, 1e-9)
            report["geom_r2_dis"] = float(r2[0])
            report["geom_r2_theta"] = float(r2[1])
            report["geom_mse"] = (agg["geom_se"] / n).tolist()
        return report

    # ---------------- checkpoints ----------------

    def save(self, path: str) -> None:
        ckpt.save_pytree(path, {"params": self.state.params,
                                "batch_stats": self.state.batch_stats})

    def load(self, path: str) -> None:
        like = {"params": self.state.params,
                "batch_stats": self.state.batch_stats}
        # device-commit once; numpy leaves re-upload on every jit dispatch
        tree = jax.tree.map(jnp.asarray, ckpt.load_pytree(path, like))
        self.state = dataclasses.replace(
            self.state, params=tree["params"],
            batch_stats=tree["batch_stats"])

    def export_variables(self):
        """Frozen variables for the RL agent's encoder."""
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}
