"""Mode tables + experiment zoo coverage.

Reproduces the reference ablation grid: input modes 1-10 / output modes 0-14
(Config/auto_basic_config.py:81-213) expanded into DANetParams, and one
experiment record per reference Config/*.py file. The coverage test
instantiates and forward-steps every distinct (model, in, out, att) combo
the reference ships.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cadre_tpu.configs.danet_config import (
    INPUT_MODES,
    OUTPUT_MODES,
    params_for_modes,
)
from cadre_tpu.configs.experiments import (
    EXPERIMENTS,
    build_experiment,
    distinct_combos,
    experiment_params,
)

SMALL = dict(image_height=64, image_width=96, feat_h=2, feat_w=3,
             da_feature_channel=64, inter_att_dims=48, z_dims=32)


def test_mode_tables_cover_reference_grid():
    assert set(INPUT_MODES) == set(range(1, 11))
    assert set(OUTPUT_MODES) == set(range(0, 15))


def test_input_channel_arithmetic():
    # reference formula (auto_danet.py:111-122): 3/backbone-view + extras
    assert params_for_modes(1, 0).input_channel == 3
    assert params_for_modes(2, 0).input_channel == 12     # 4 stacked frames
    assert params_for_modes(3, 0).input_channel == 6      # + lidar
    assert params_for_modes(4, 0).input_channel == 24     # 4 frames + lidar
    assert params_for_modes(5, 0).input_channel == 4      # + route raster
    assert params_for_modes(6, 0).input_channel == 10     # + left/right cams
    assert params_for_modes(7, 0).input_channel == 5      # + speed channel
    assert params_for_modes(8, 0).input_channel == 8      # lidar+route+speed
    assert params_for_modes(9, 0).input_channel == 4      # production
    assert params_for_modes(10, 0).input_channel == 3     # camera + bc_speed
    assert params_for_modes(9, 0).in_bc_speed
    assert not params_for_modes(7, 0).in_bc_speed


def test_output_head_flags():
    prod = params_for_modes(9, 12)
    assert prod.pred_camera_seg and prod.pred_route and \
        prod.pred_light_state and prod.pred_bc
    assert prod.camera_output_channel == 8
    recon = params_for_modes(1, 0)
    assert recon.camera_output_channel == 3 and not recon.pred_bc
    lidar = params_for_modes(3, 4)
    assert lidar.pred_lidar and lidar.pred_light_dist
    multi = params_for_modes(6, 11)
    assert multi.pred_left_camera_seg and \
        multi.left_camera_output_channel == 8


def test_experiment_zoo_matches_reference_inventory():
    # one record per reference Config/*.py experiment file (40 files)
    # + the TPU-extension auto_danet_geom / auto_danet_camroute entries
    assert len(EXPERIMENTS) == 42
    from cadre_tpu.configs.experiments import experiment_params
    assert experiment_params("auto_danet_geom").pred_route_geom
    cam = experiment_params("auto_danet_camroute")
    assert cam.in_route_blank and cam.pred_route_geom
    model, i, o, att = EXPERIMENTS["auto_danet"]
    assert (model, i, o, att) == ("danet", 9, 12, "transformer")
    # the paper's CoPM-without-attention ablation is present
    assert EXPERIMENTS["auto_danet_exp50"][3] == "invaild"


@pytest.mark.slow
@pytest.mark.parametrize("combo", distinct_combos(),
                         ids=lambda c: f"{c[0]}-in{c[1]}-out{c[2]}-{c[3]}")
def test_every_shipped_combo_instantiates_and_steps(combo):
    model_name, in_mode, out_mode, att = combo
    name = next(k for k, v in EXPERIMENTS.items() if v == combo)
    overrides = dict(SMALL)
    if model_name in ("cil", "cilrs"):
        model, cfg = build_experiment(name)
        x = jnp.zeros((1, 88, 200, 3))
        speed = jnp.zeros((1, 1))
        variables = model.init(jax.random.PRNGKey(0), x, speed,
                               jnp.zeros((1,), jnp.int32))
        out = model.apply(variables, x, speed, jnp.zeros((1,), jnp.int32))
        assert np.all(np.isfinite(np.asarray(out[0])))
        return

    model, cfg = build_experiment(name, **overrides)
    x = jnp.zeros((1, cfg.image_height, cfg.image_width, cfg.input_channel))
    rngs = {"params": jax.random.PRNGKey(0),
            "reparam": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    if model is None:
        from cadre_tpu.models.danet import DANet

        model = DANet(params_cfg=cfg)
        speed = jnp.zeros((1, 1)) if cfg.in_bc_speed else None
        variables = model.init(rngs, x, speed)
        out = model.apply(variables, x, speed)
    else:
        variables = model.init(rngs, x)
        out = model.apply(variables, x,
                          rngs={"reparam": jax.random.PRNGKey(3)}
                          if "vae" in model_name else None)
    assert isinstance(out, dict) and out
    # every flagged head is present with finite values
    for key in out:
        arr = np.asarray(out[key])
        assert np.all(np.isfinite(arr)), (name, key)
    if cfg.pred_camera_seg and "camera" in out:
        assert out["camera"].shape[-1] == 8
