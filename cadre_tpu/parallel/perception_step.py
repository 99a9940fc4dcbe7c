"""Data-parallel perception training step over a device mesh.

The reference's multi-GPU perception path is DDP + SyncBatchNorm over NCCL
(Models/experiments_builder.py:81-101). TPU-native: one shard_map program
with the batch sharded over `data`, gradients pmean-ed, and BatchNorm batch
statistics computed cross-replica via the BN axis_name — numerically the
SyncBN behavior, without a wrapper module.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cadre_tpu.configs.danet_config import DANetParams, PerceptionTrainParams
from cadre_tpu.models.danet import create_danet
from cadre_tpu.perception.losses import total_danet_loss
from cadre_tpu.perception.trainer import make_optimizer

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_distributed_perception_trainer(
        cfg: DANetParams, tp: PerceptionTrainParams, steps_per_epoch: int,
        rng: jax.Array, mesh: Mesh, axis_name: str = "data",
        seg_class_weight=None, light_class_weight=None):
    """Returns (init_state, jitted update, shard_batch fn).

    The model is created with BN axis_name so batch statistics psum across
    replicas (SyncBN semantics).
    """
    model, variables = create_danet(cfg, rng, train=True,
                                    axis_name=axis_name)
    opt = make_optimizer(tp, steps_per_epoch)
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": opt.init(variables["params"]),
    }
    seg_w = jnp.asarray(seg_class_weight) if seg_class_weight is not None \
        else None
    light_w = jnp.asarray(light_class_weight) \
        if light_class_weight is not None else None

    def loss_fn(params, stats, batch, rng_):
        x = batch["x"]
        if getattr(cfg, "in_route_blank", False):
            from cadre_tpu.perception.data import blank_route_plane

            x = blank_route_plane(x)  # camera-route: input-only blanking
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            x, batch["speed"], train=True,
            rngs={"dropout": rng_}, mutable=["batch_stats"])
        total, losses = total_danet_loss(outputs, batch, cfg, seg_w, light_w,
                                         light_weight=tp.w_light_state)
        return total, (losses, mutated["batch_stats"])

    def update(state, batch, rng_):
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"], state["batch_stats"],
                                   batch, rng_)
        grads = jax.lax.pmean(grads, axis_name)
        losses = jax.tree.map(lambda x: jax.lax.pmean(x, axis_name),
                              dict(losses, total=total))
        updates, opt_state = opt.update(grads, state["opt_state"],
                                        state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "batch_stats": new_stats,
                "opt_state": opt_state}, losses

    batch_spec = {
        "x": P(axis_name), "camera_rgb": P(axis_name),
        "camera_seg": P(axis_name), "route_fig": P(axis_name),
        "speed": P(axis_name), "target_speed": P(axis_name),
        "steer": P(axis_name), "throttle": P(axis_name),
        "command": P(axis_name), "light_state": P(axis_name),
        "light_dist": P(axis_name),
    }
    if getattr(cfg, "pred_route_geom", False):
        # geom-head targets; the in_specs tree must match the batch pytree
        # exactly, so only include them when the loss will consume them
        batch_spec["dis"] = P(axis_name)
        batch_spec["theta"] = P(axis_name)
    fn = shard_map(update, mesh=mesh,
                   in_specs=(P(), batch_spec, P()),
                   out_specs=(P(), P()),
                   check_vma=False)
    update_jit = jax.jit(fn)

    def shard_batch(batch):
        return {
            k: jax.device_put(v, NamedSharding(mesh, batch_spec[k]))
            for k, v in batch.items() if k in batch_spec
        }

    return state, update_jit, shard_batch
