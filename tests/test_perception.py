"""Perception pipeline tests: losses, data collection/loading, train step."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cadre_tpu.configs.danet_config import PerceptionTrainParams, danet_params
from cadre_tpu.envs.expert import OracleExpert
from cadre_tpu.envs.sim_env import SimDrivingEnv
from cadre_tpu.perception.data import (
    PerceptionDataLoader,
    collect_dataset,
    compute_stats,
)
from cadre_tpu.perception.losses import (
    recon_loss,
    seg_loss,
    weighted_cross_entropy,
)
from cadre_tpu.perception.trainer import PerceptionTrainer

torch = pytest.importorskip("torch")

SMALL = danet_params(da_feature_channel=64, inter_att_dims=48, z_dims=32)


def test_weighted_ce_matches_torch():
    tl = torch.nn.CrossEntropyLoss(weight=torch.tensor([1.0, 2.0, 0.5]))
    logits = torch.randn(6, 3)
    labels = torch.tensor([0, 1, 2, 1, 0, 2])
    ref = tl(logits, labels).item()
    out = weighted_cross_entropy(jnp.asarray(logits.numpy()),
                                 jnp.asarray(labels.numpy()),
                                 jnp.asarray([1.0, 2.0, 0.5]))
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)


def test_seg_and_recon_scaling():
    # seg loss scaled by h*w; recon by c*h*w (cal_losses.py danet branch)
    logits = jnp.zeros((2, 4, 6, 3))
    labels = jnp.zeros((2, 4, 6), jnp.int32)
    s = seg_loss(logits, labels)
    np.testing.assert_allclose(float(s), -np.log(1 / 3) * 24, rtol=1e-5)
    pred = jnp.zeros((2, 4, 6, 3))
    tgt = jnp.ones((2, 4, 6, 3))
    np.testing.assert_allclose(float(recon_loss(pred, tgt)), 72.0, rtol=1e-6)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("percept_data"))
    env = SimDrivingEnv(seed=0, seq_length=2, vehicle_num=(4, 2))
    shards = collect_dataset(env, OracleExpert(), 40, out, shard_size=16)
    assert len(shards) == 3
    return out


def test_collect_and_load(dataset_dir):
    loader = PerceptionDataLoader(dataset_dir, batch_size=8, seed=1)
    assert loader.num_frames == 40
    assert len(loader) == 5
    batches = list(loader)
    assert len(batches) == 5
    b = batches[0]
    assert b["x"].shape == (8, 144, 256, 4)
    assert b["camera_seg"].shape == (8, 144, 256)
    assert b["route_fig"].shape == (8, 144, 256, 1)
    assert b["x"].min() >= 0.0 and b["x"].max() <= 1.0
    # roadside props add building/pole/vegetation classes 4/5/6
    assert set(np.unique(b["camera_seg"])) <= set(range(8))


def test_stats_class_weights(dataset_dir):
    loader = PerceptionDataLoader(dataset_dir, batch_size=8)
    stats = compute_stats(loader.paths)
    assert stats.num_frames == 40
    assert stats.seg_class_weight.shape == (8,)
    # road (1) dominates -> lowest weight among present classes
    present = stats.seg_class_weight > 0
    assert stats.seg_class_weight[1] <= stats.seg_class_weight[present].max()


def test_trainer_loss_decreases(dataset_dir, tmp_path):
    loader = PerceptionDataLoader(dataset_dir, batch_size=8, seed=2)
    stats = compute_stats(loader.paths)
    tp = PerceptionTrainParams(batch_size=8, max_epochs=3, warmup_epochs=1)
    trainer = PerceptionTrainer(SMALL, tp, steps_per_epoch=len(loader),
                                rng=jax.random.PRNGKey(0),
                                seg_class_weight=stats.seg_class_weight,
                                light_class_weight=stats.light_class_weight)
    first = trainer.solve(loader, epochs=1, work_dir=str(tmp_path),
                          save_interval=1)
    second = trainer.solve(loader, epochs=1)
    assert np.isfinite(second["total"])
    assert second["total"] < first["total"]
    # checkpoint written and loads
    ckpt_path = tmp_path / "net_epoch0.msgpack"
    assert ckpt_path.exists()
    trainer.load(str(ckpt_path))
    # eval metrics include accuracies
    metrics = trainer.evaluate(loader)
    assert 0.0 <= metrics["seg_accuracy"] <= 1.0
    assert 0.0 <= metrics["light_accuracy"] <= 1.0
    # export for the RL agent
    variables = trainer.export_variables()
    assert "params" in variables and "batch_stats" in variables


def test_registry_model_trains(dataset_dir):
    from cadre_tpu.models.registry import adapt_config, build_model

    loader = PerceptionDataLoader(dataset_dir, batch_size=8, seed=3)
    cfg = adapt_config("oldv2_vae", SMALL)
    assert not cfg.pred_bc
    tp = PerceptionTrainParams(batch_size=8, max_epochs=1, warmup_epochs=1)
    trainer = PerceptionTrainer(cfg, tp, steps_per_epoch=len(loader),
                                rng=jax.random.PRNGKey(0),
                                model=build_model("oldv2_vae", cfg))
    batch = next(iter(loader))
    losses = trainer.train_step(batch, jax.random.PRNGKey(1))
    for key in ("seg", "route", "light_state", "visual_kld"):
        assert np.isfinite(float(losses[key])), key


def test_per_class_evaluation(dataset_dir):
    loader = PerceptionDataLoader(dataset_dir, batch_size=8, seed=4)
    tp = PerceptionTrainParams(batch_size=8, max_epochs=1, warmup_epochs=0)
    trainer = PerceptionTrainer(SMALL, tp, steps_per_epoch=len(loader),
                                rng=jax.random.PRNGKey(4))
    rep = trainer.evaluate_per_class(loader)
    # per-class tables exist with the configured class counts
    assert rep["seg_per_class"].shape == (8,)
    assert rep["light_per_class"].shape == (4,)
    assert 0.0 <= rep["seg_pixel_acc"] <= 1.0
    assert 0.0 <= rep["light_acc"] <= 1.0
    # classes absent from the data do not contribute to the mean
    seen = rep["seg_counts"] > 0
    import numpy as np
    assert np.isclose(rep["seg_mean_class_acc"],
                      rep["seg_per_class"][seen].mean())
    # split-by-paths loader (the --holdout mechanism)
    split = PerceptionDataLoader(loader.paths[-1:], batch_size=8)
    assert split.paths == loader.paths[-1:]


def test_packed_wire_format_matches_unpacked(dataset_dir):
    """packed=True ships uint8 and unpack_batch reproduces the f32 batch."""
    import jax.numpy as jnp

    from cadre_tpu.perception.data import unpack_batch

    a = PerceptionDataLoader(dataset_dir, batch_size=8, seed=7)
    b = PerceptionDataLoader(dataset_dir, batch_size=8, seed=7, packed=True,
                             cache_in_memory=True)
    ba, bb = next(iter(a)), next(iter(b))
    assert sum(v.nbytes for v in ba.values()) \
        > 5 * sum(v.nbytes for v in bb.values())
    ub = unpack_batch({k: jnp.asarray(v) for k, v in bb.items()})
    np.testing.assert_allclose(np.asarray(ub["x"]), ba["x"], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ub["camera_seg"]),
                                  ba["camera_seg"])
    np.testing.assert_allclose(np.asarray(ub["route_fig"]), ba["route_fig"],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ub["speed"]), ba["speed"])
    assert unpack_batch(ba) is ba          # no-op on unpacked batches


def test_trainer_runs_on_packed_batches(dataset_dir):
    loader = PerceptionDataLoader(dataset_dir, batch_size=8, seed=2,
                                  packed=True, cache_in_memory=True)
    tp = PerceptionTrainParams(batch_size=8, max_epochs=1, warmup_epochs=0)
    trainer = PerceptionTrainer(SMALL, tp, steps_per_epoch=len(loader),
                                rng=jax.random.PRNGKey(0))
    out = trainer.solve(loader, epochs=1)
    assert np.isfinite(out["total"])
    metrics = trainer.evaluate(loader)
    assert 0.0 <= metrics["seg_accuracy"] <= 1.0
    rep = trainer.evaluate_per_class(loader)
    assert rep["seg_counts"].sum() > 0


def test_device_augment_trains_and_perturbs(dataset_dir):
    import jax.numpy as jnp

    loader = PerceptionDataLoader(dataset_dir, batch_size=8, seed=3,
                                  packed=True, cache_in_memory=True)
    tp = PerceptionTrainParams(batch_size=8, max_epochs=1, warmup_epochs=0)
    trainer = PerceptionTrainer(SMALL, tp, steps_per_epoch=len(loader),
                                rng=jax.random.PRNGKey(0),
                                device_augment=True)
    out = trainer.solve(loader, epochs=1)
    assert np.isfinite(out["total"])
    # the augmentation perturbs rgb but leaves the route channel clean
    from cadre_tpu.perception.data import unpack_batch

    b = unpack_batch({k: jnp.asarray(v) for k, v in next(iter(loader)).items()})
    aug = trainer._augment_on_device(b, jax.random.PRNGKey(7))
    d_rgb = float(jnp.abs(aug["x"][..., :3] - b["x"][..., :3]).mean())
    d_route = float(jnp.abs(aug["x"][..., 3:] - b["x"][..., 3:]).max())
    assert d_rgb > 1e-4 and d_route == 0.0


def test_dataset_route_geom_labels(dataset_dir, tmp_path):
    # dis/theta labels ride every batch format (pred_route_geom targets)
    for packed in (True, False):
        b = next(iter(PerceptionDataLoader(dataset_dir, batch_size=8,
                                           packed=packed)))
        assert b["dis"].shape == (8,) and b["theta"].shape == (8,)
        assert b["dis"].dtype == np.float32
        assert np.all(b["dis"] >= 0.0)
    # shards collected before the fields existed load with zero labels
    legacy = {k: v for k, v in
              np.load(PerceptionDataLoader(dataset_dir, 8).paths[0]).items()
              if k not in ("dis", "theta")}
    np.savez_compressed(tmp_path / "shard_00000.npz", **legacy)
    b = next(iter(PerceptionDataLoader(str(tmp_path), batch_size=8,
                                       packed=True)))
    assert float(np.abs(b["dis"]).max()) == 0.0
    assert float(np.abs(b["theta"]).max()) == 0.0


def test_route_geom_head_trains(dataset_dir):
    # the aux head joins the multi-task loss and the holdout report
    cfg = danet_params(da_feature_channel=64, inter_att_dims=48, z_dims=32,
                       pred_route_geom=True)
    loader = PerceptionDataLoader(dataset_dir, batch_size=8, seed=4)
    stats = compute_stats(loader.paths)
    tp = PerceptionTrainParams(batch_size=8, max_epochs=1, warmup_epochs=0)
    trainer = PerceptionTrainer(cfg, tp, steps_per_epoch=len(loader),
                                rng=jax.random.PRNGKey(0),
                                seg_class_weight=stats.seg_class_weight,
                                light_class_weight=stats.light_class_weight)
    out = trainer.solve(loader, epochs=1)
    assert np.isfinite(out["route_geom"])
    rep = trainer.evaluate_per_class(
        PerceptionDataLoader(loader.paths, batch_size=8, packed=True))
    assert "geom_r2_dis" in rep and "geom_r2_theta" in rep
    # the extra params round-trip through the RL-side checkpoint loader
    import tempfile

    from cadre_tpu.utils.checkpoint import load_danet_checkpoint

    with tempfile.NamedTemporaryFile(suffix=".msgpack") as f:
        trainer.save(f.name)
        variables = load_danet_checkpoint(f.name, cfg)
    assert "route_geom_branch" in variables["params"]


def test_camera_route_trainer_blanks_input_only(dataset_dir):
    """in_route_blank: the route raster is removed from the model INPUT
    (metrics invariant to garbage in x's route plane) but stays a TARGET
    (the route recon loss is still computed against batch['route_fig'])."""
    cfg = danet_params(da_feature_channel=64, inter_att_dims=48, z_dims=32,
                       in_route_blank=True)
    loader = PerceptionDataLoader(dataset_dir, batch_size=8, seed=4)
    stats = compute_stats(loader.paths)
    tp = PerceptionTrainParams(batch_size=8, max_epochs=1, warmup_epochs=0)
    trainer = PerceptionTrainer(cfg, tp, steps_per_epoch=len(loader),
                                rng=jax.random.PRNGKey(0),
                                seg_class_weight=stats.seg_class_weight,
                                light_class_weight=stats.light_class_weight)
    batch = next(iter(loader))
    m1 = trainer.eval_step(batch)
    b2 = dict(batch)
    x = np.array(batch["x"])
    x[..., 3] = np.random.RandomState(0).rand(*x[..., 3].shape)
    b2["x"] = x
    m2 = trainer.eval_step(b2)
    assert np.allclose(m1["total"], m2["total"])
    assert np.isfinite(m1["route"]) and m1["route"] > 0.0


def test_light_weight_scales_total_only():
    """w_light_state scales the light CE contribution to the TOTAL while
    the logged per-head loss stays the raw CE (comparable across runs)."""
    from cadre_tpu.perception.losses import total_danet_loss

    cfg = danet_params()
    rng = np.random.RandomState(0)
    B, H, W = 2, 8, 8
    outputs = {
        "camera": jnp.asarray(rng.randn(B, H, W, 8), jnp.float32),
        "route": jnp.asarray(rng.rand(B, H, W, 1), jnp.float32),
        "light_state": jnp.asarray(rng.randn(B, 4), jnp.float32),
        "light_dist": jnp.asarray(rng.randn(B, 1), jnp.float32),
        "steer": jnp.asarray(rng.randn(B), jnp.float32),
        "throttle": jnp.asarray(rng.randn(B), jnp.float32),
        "route_geom": jnp.asarray(rng.randn(B, 2), jnp.float32),
    }
    batch = {
        "camera_seg": jnp.asarray(rng.randint(0, 8, (B, H, W)), jnp.int32),
        "camera_rgb": jnp.asarray(rng.rand(B, H, W, 3), jnp.float32),
        "route_fig": jnp.asarray(rng.rand(B, H, W, 1), jnp.float32),
        "light_state": jnp.asarray([1, 3], jnp.int32),
        "light_dist": jnp.asarray(rng.rand(B), jnp.float32),
        "steer": jnp.asarray(rng.randn(B), jnp.float32),
        "throttle": jnp.asarray(rng.randn(B), jnp.float32),
        "dis": jnp.asarray(rng.randn(B), jnp.float32),
        "theta": jnp.asarray(rng.randn(B), jnp.float32),
    }
    t_ref, l_ref = total_danet_loss(outputs, batch, cfg)
    t_boost, l_boost = total_danet_loss(outputs, batch, cfg,
                                        light_weight=300.0)
    # per-head logged loss identical; total differs by (300-0.1)*CE
    assert np.allclose(l_ref["light_state"], l_boost["light_state"])
    expected = float(t_ref) + (300.0 - 0.1) * float(l_ref["light_state"])
    assert np.isclose(float(t_boost), expected, rtol=1e-5)


def test_trainer_uses_tp_light_weight(dataset_dir):
    """PerceptionTrainer routes tp.w_light_state into the jitted loss."""
    loader = PerceptionDataLoader(dataset_dir, batch_size=4)
    stats = compute_stats(loader.paths)
    cfg = danet_params(da_feature_channel=16, inter_att_dims=16, z_dims=16)
    batch = next(iter(loader))
    totals = []
    for w in (0.1, 1000.0):
        tp = PerceptionTrainParams(batch_size=4, max_epochs=1,
                                   w_light_state=w)
        tr = PerceptionTrainer(cfg, tp, steps_per_epoch=1,
                               rng=jax.random.PRNGKey(0),
                               seg_class_weight=stats.seg_class_weight,
                               light_class_weight=stats.light_class_weight)
        m = tr.eval_step(batch)
        totals.append(float(m["total"]))
    assert totals[1] > totals[0]
