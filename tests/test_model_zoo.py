"""Shape tests for the ablation/baseline model zoo."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cadre_tpu.configs.danet_config import danet_params
from cadre_tpu.models.cil import CarlaNet, CilrsNet, SmallCNN
from cadre_tpu.models.unet import NestedUNet, UNet
from cadre_tpu.models.vae import BetaVAE, DABetaVAE, VanillaVAE

CFG = danet_params(image_height=64, image_width=96, feat_h=2, feat_w=3,
                   da_feature_channel=64, inter_att_dims=48, z_dims=32)


def test_vanilla_vae_heads():
    model = VanillaVAE(params_cfg=CFG)
    x = jnp.zeros((2, 64, 96, 4))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["camera"].shape == (2, 64, 96, 8)
    assert out["mu"].shape == (2, 32)
    assert out["logvar"].shape == (2, 32)
    assert out["steer"].shape == (2,)
    z = model.apply(variables, x, method=VanillaVAE.latent)
    assert z.shape == (2, 32)


def test_beta_vae_reparameterizes():
    model = BetaVAE(params_cfg=CFG)
    x = jnp.ones((1, 64, 96, 4)) * 0.3
    variables = model.init(jax.random.PRNGKey(0), x)
    o1 = model.apply(variables, x, rng=jax.random.PRNGKey(1))
    o2 = model.apply(variables, x, rng=jax.random.PRNGKey(2))
    # different rng -> different reconstructions (stochastic z)
    assert not np.allclose(np.asarray(o1["camera"]), np.asarray(o2["camera"]))


def test_da_beta_vae():
    model = DABetaVAE(params_cfg=CFG)
    x = jnp.zeros((2, 64, 96, 4))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["mu"].shape == (2, 32)
    assert out["bc_mu"].shape == (2, 32)
    z = model.apply(variables, x, method=DABetaVAE.latent)
    assert z.shape == (2, 64)


@pytest.mark.parametrize("recurrent,attention", [(False, False),
                                                 (False, True),
                                                 (True, False)])
def test_unet_variants(recurrent, attention):
    model = UNet(out_channels=8, base=8, depth=3, recurrent=recurrent,
                 attention=attention)
    x = jnp.zeros((1, 64, 96, 4))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 64, 96, 8)


def test_nested_unet():
    model = NestedUNet(out_channels=1, base=8)
    x = jnp.zeros((1, 64, 96, 4))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 64, 96, 1)


def test_carla_net_branching():
    model = CarlaNet()
    img = jnp.zeros((2, 88, 200, 3))
    speed = jnp.zeros((2, 1))
    variables = model.init(jax.random.PRNGKey(0), img, speed)
    all_branches, pred_speed = model.apply(variables, img, speed)
    assert all_branches.shape == (2, 4, 3)
    assert pred_speed.shape == (2,)
    cmd = jnp.asarray([1, 3])
    selected, _ = model.apply(variables, img, speed, cmd)
    assert selected.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(selected[0]),
                               np.asarray(all_branches[0, 1]), rtol=1e-5)


def test_cilrs_net():
    model = CilrsNet(arch="resnet18")
    img = jnp.zeros((2, 88, 200, 3))
    speed = jnp.zeros((2, 1))
    variables = model.init(jax.random.PRNGKey(0), img, speed)
    selected, pred_speed = model.apply(variables, img, speed,
                                       jnp.asarray([0, 2]))
    assert selected.shape == (2, 3)
    assert pred_speed.shape == (2,)


def test_small_cnn():
    model = SmallCNN(z_dims=64)
    x = jnp.zeros((2, 144, 256, 4))
    variables = model.init(jax.random.PRNGKey(0), x)
    z = model.apply(variables, x)
    assert z.shape == (2, 64)


def test_old_vae_variants():
    # old_vae's deconv geometry is fixed to 144x256 (9x16 base, x16), like
    # the reference's hard-coded Reshape(-1, 64, 9, 16)
    cfg = danet_params(z_dims=16)
    x = jnp.zeros((1, 144, 256, 4))
    from cadre_tpu.models.vae import OldVAE, OldV2VAE

    m1 = OldVAE(params_cfg=cfg)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    out = m1.apply(v1, x, rng=jax.random.PRNGKey(1))
    assert out["camera"].shape == (1, 144, 256, 3)       # rgb recon
    assert float(out["camera"].min()) >= 0.0             # sigmoid output
    assert out["mu"].shape == (1, 16)
    assert "light_state" not in out

    m2 = OldV2VAE(params_cfg=cfg)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    out = m2.apply(v2, x)
    assert out["camera"].shape == (1, 144, 256, 8)       # seg logits
    assert out["route"].shape == (1, 144, 256, 1)
    assert out["light_state"].shape == (1, 4)
    z = m2.apply(v2, x, method=OldV2VAE.latent)
    assert z.shape == (1, 16)


def test_cil_final_net_uncertainty():
    from cadre_tpu.models.cil import CilFinalNet

    img = jnp.zeros((2, 88, 200, 3))
    speed = jnp.zeros((2, 1))
    cmd = jnp.asarray([0, 3])
    for structure in (2, 3):
        model = CilFinalNet(structure=structure)
        variables = model.init(jax.random.PRNGKey(0), img, speed, cmd)
        controls, pred_speed, lv_control, lv_speed = model.apply(
            variables, img, speed, cmd)
        assert controls.shape == (2, 3)
        assert pred_speed.shape == (2,)
        assert lv_control.shape == (2, 3)
        assert lv_speed.shape == (2,)
        # dense (no command) evaluation returns all branches
        all_c, _, all_lv, _ = model.apply(variables, img, speed)
        assert all_c.shape == (2, 4, 3)
        assert all_lv.shape == (2, 4, 3)


def test_registry_builds_every_zoo_model():
    from cadre_tpu.models.registry import build_model

    cfg = danet_params(image_height=32, image_width=32, feat_h=1, feat_w=1,
                       da_feature_channel=32, inter_att_dims=16, z_dims=8,
                       camera_output_channel=4)
    assert build_model("danet", cfg) is None  # trainer default path
    x = jnp.zeros((1, 32, 32, 4))
    for name in ("vanilla_vae", "beta_vae", "unet", "att_unet",
                 "nested_unet"):
        model = build_model(name, cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, train=True)
        out = model.apply(variables, x,
                          mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(2)},
                          train=True)[0]
        assert out["camera"].shape[0] == 1
    with pytest.raises(ValueError):
        build_model("nope", cfg)
