"""CIL trainer + distributed perception step tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cadre_tpu.configs.danet_config import PerceptionTrainParams, danet_params
from cadre_tpu.models.cil import CilrsNet
from cadre_tpu.perception.cil_trainer import CILTrainer


def _batch(rng, b=8, h=64, w=96):
    return {
        "camera_rgb": rng.rand(b, h, w, 3).astype(np.float32),
        "speed": rng.rand(b, 1).astype(np.float32) * 9,
        "command": rng.randint(0, 4, (b,)).astype(np.int32),
        "steer": (rng.rand(b).astype(np.float32) - 0.5),
        "throttle": rng.rand(b).astype(np.float32) * 0.75,
    }


def test_cil_trainer_step_decreases_loss():
    rng = np.random.RandomState(0)
    tp = PerceptionTrainParams(max_epochs=3, warmup_epochs=1, lr=1e-3)
    trainer = CILTrainer(CilrsNet(arch="resnet18"), tp, steps_per_epoch=4,
                         rng=jax.random.PRNGKey(0), image_hw=(64, 96))
    batch = _batch(rng)
    losses = [trainer.train_step(batch, jax.random.PRNGKey(i))["total"]
              for i in range(8)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_distributed_perception_step(mesh8):
    from cadre_tpu.parallel.perception_step import (
        make_distributed_perception_trainer,
    )

    cfg = danet_params(image_height=64, image_width=96, feat_h=2, feat_w=3,
                       da_feature_channel=64, inter_att_dims=48, z_dims=32)
    tp = PerceptionTrainParams(max_epochs=2, warmup_epochs=1)
    state, update, shard_batch = make_distributed_perception_trainer(
        cfg, tp, steps_per_epoch=2, rng=jax.random.PRNGKey(0), mesh=mesh8)

    rng = np.random.RandomState(1)
    b = 16  # 2 per device
    batch = {
        "x": rng.rand(b, 64, 96, 4).astype(np.float32),
        "camera_rgb": rng.rand(b, 64, 96, 3).astype(np.float32),
        "camera_seg": rng.randint(0, 8, (b, 64, 96)).astype(np.int32),
        "route_fig": rng.rand(b, 64, 96, 1).astype(np.float32),
        "speed": rng.rand(b, 1).astype(np.float32),
        "target_speed": rng.rand(b).astype(np.float32),
        "steer": rng.rand(b).astype(np.float32),
        "throttle": rng.rand(b).astype(np.float32),
        "command": rng.randint(0, 4, (b,)).astype(np.int32),
        "light_state": rng.randint(0, 4, (b,)).astype(np.int32),
        "light_dist": rng.rand(b).astype(np.float32),
    }
    sharded = shard_batch(batch)
    new_state, losses = update(state, sharded, jax.random.PRNGKey(2))
    assert np.isfinite(float(losses["total"]))
    # warmup lr(step 0) == 0, so params move from the SECOND step on
    new_state2, losses2 = update(new_state, sharded, jax.random.PRNGKey(3))
    assert np.isfinite(float(losses2["total"]))
    l1 = jax.tree_util.tree_leaves(new_state["params"])[0]
    l2 = jax.tree_util.tree_leaves(new_state2["params"])[0]
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_distributed_geom_camroute_step(mesh8):
    """pred_route_geom + in_route_blank over the mesh: the (dis, theta)
    targets must ride the batch spec (regression: shard_batch used to drop
    them, crashing the geom loss under shard_map), and the loss must be
    invariant to garbage in the blanked route input plane."""
    from cadre_tpu.parallel.perception_step import (
        make_distributed_perception_trainer,
    )

    cfg = danet_params(image_height=32, image_width=64, feat_h=1, feat_w=2,
                       da_feature_channel=32, inter_att_dims=16, z_dims=8,
                       pred_route_geom=True, route_geom_weight=100.0,
                       in_route_blank=True)
    tp = PerceptionTrainParams(max_epochs=1, warmup_epochs=0)
    state, update, shard_batch = make_distributed_perception_trainer(
        cfg, tp, steps_per_epoch=2, rng=jax.random.PRNGKey(0), mesh=mesh8)
    rng = np.random.RandomState(1)
    b = 8
    batch = {
        "x": rng.rand(b, 32, 64, 4).astype(np.float32),
        "camera_rgb": rng.rand(b, 32, 64, 3).astype(np.float32),
        "camera_seg": rng.randint(0, 8, (b, 32, 64)).astype(np.int32),
        "route_fig": rng.rand(b, 32, 64, 1).astype(np.float32),
        "speed": rng.rand(b, 1).astype(np.float32),
        "target_speed": rng.rand(b).astype(np.float32),
        "steer": rng.rand(b).astype(np.float32),
        "throttle": rng.rand(b).astype(np.float32),
        "command": rng.randint(0, 4, (b,)).astype(np.int32),
        "light_state": rng.randint(0, 4, (b,)).astype(np.int32),
        "light_dist": rng.rand(b).astype(np.float32),
        "dis": rng.rand(b).astype(np.float32),
        "theta": rng.rand(b).astype(np.float32),
    }
    _, losses = update(state, shard_batch(batch), jax.random.PRNGKey(2))
    assert np.isfinite(float(losses["route_geom"]))
    b2 = dict(batch)
    x = batch["x"].copy()
    x[..., 3] = rng.rand(b, 32, 64)
    b2["x"] = x
    _, losses2 = update(state, shard_batch(b2), jax.random.PRNGKey(2))
    t1, t2 = float(losses["total"]), float(losses2["total"])
    assert abs(t1 - t2) <= 1e-4 * max(1.0, abs(t1))
