"""Shape/semantics tests for the DANet perception encoder."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cadre_tpu.configs.danet_config import danet_params
from cadre_tpu.models.danet import DANet, create_danet
from cadre_tpu.ops.dual_attention import cam_apply, pam_apply


@pytest.fixture(scope="module")
def small_cfg():
    # tiny image keeps CPU test time sane; feat = stride-32 of 64x96 = 2x3
    return danet_params(image_height=64, image_width=96, feat_h=2, feat_w=3)


@pytest.fixture(scope="module")
def model_and_vars(small_cfg):
    return create_danet(small_cfg, jax.random.PRNGKey(0))


def test_latent_shape(small_cfg, model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((2, 64, 96, 4))
    z = model.apply(variables, x, method=DANet.latent)
    assert z.shape == (2, 2 * small_cfg.z_dims)


def test_forward_heads(small_cfg, model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((2, 64, 96, 4))
    speed = jnp.zeros((2, 1))
    out = model.apply(variables, x, speed)
    assert out["camera"].shape == (2, 64, 96, 8)
    assert out["route"].shape == (2, 64, 96, 1)
    assert out["light_state"].shape == (2, 4)
    assert out["steer"].shape == (2,)
    assert out["throttle"].shape == (2,)
    # route decoder ends in sigmoid
    assert float(out["route"].min()) >= 0.0
    assert float(out["route"].max()) <= 1.0


def test_latent_add_mode(model_and_vars, small_cfg):
    model, variables = model_and_vars
    x = jnp.ones((1, 64, 96, 4)) * 0.5
    z_cat = model.apply(variables, x, "concate", method=DANet.latent)
    z_add = model.apply(variables, x, "add", method=DANet.latent)
    assert z_add.shape == (1, small_cfg.z_dims)
    np.testing.assert_allclose(
        np.asarray(z_cat[:, : small_cfg.z_dims] + z_cat[:, small_cfg.z_dims:]),
        np.asarray(z_add), rtol=1e-5, atol=1e-5)


def test_pam_zero_gamma_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8, 16))
    q = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 8, 2))
    k = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 8, 2))
    v = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 8, 16))
    out = pam_apply(x, q, k, v, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_cam_matches_manual():
    """CAM math vs a dense manual computation (da_att.py:63-83)."""
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 3, 4))
    gamma = jnp.ones((1,)) * 0.7
    out = cam_apply(x, gamma)

    xf = np.asarray(x).reshape(6, 4).T  # [C, HW]
    energy = xf @ xf.T
    energy_new = energy.max(axis=-1, keepdims=True) - energy
    att = np.exp(energy_new - energy_new.max(-1, keepdims=True))
    att = att / att.sum(-1, keepdims=True)
    manual = att @ xf  # [C, HW]
    manual = manual.T.reshape(1, 2, 3, 4)
    np.testing.assert_allclose(np.asarray(out), 0.7 * manual + np.asarray(x),
                               rtol=1e-4, atol=1e-5)


def test_train_mode_updates_batch_stats(small_cfg):
    model, variables = create_danet(small_cfg, jax.random.PRNGKey(0),
                                    train=True)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 64, 96, 4))
    speed = jnp.zeros((2, 1))
    out, mutated = model.apply(
        variables, x, speed, train=True,
        rngs={"dropout": jax.random.PRNGKey(7)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    old = variables["batch_stats"]["backbone"]["bn1"]["mean"]
    new = mutated["batch_stats"]["backbone"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_att_type_ablations(small_cfg):
    for att in ["invaild"]:
        cfg = danet_params(image_height=64, image_width=96, feat_h=2,
                           feat_w=3, att_type=att)
        model, variables = create_danet(cfg, jax.random.PRNGKey(0))
        z = model.apply(variables, jnp.zeros((1, 64, 96, 4)),
                        method=DANet.latent)
        assert z.shape == (1, 2 * cfg.z_dims)
