"""Numerical parity: torch DANet checkpoint -> flax import -> same outputs.

Uses the torch twin (cadre_tpu/utils/torch_twin.py — reference state_dict key
names) in eval mode, imports its weights via `import_danet_torch`, and checks
latents/heads match to float tolerance. This is the BASELINE.json north-star
requirement: public perception checkpoints load and reproduce reference
logits.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cadre_tpu.configs.danet_config import danet_params  # noqa: E402
from cadre_tpu.models.danet import DANet  # noqa: E402
from cadre_tpu.utils.checkpoint import import_danet_torch  # noqa: E402
from cadre_tpu.utils.torch_twin import build_torch_twin  # noqa: E402

# small config: 64x96 input -> 2x3 feature map, C=64, z=32
CFG = danet_params(image_height=64, image_width=96, feat_h=2, feat_w=3,
                   da_feature_channel=64, inter_att_dims=48, z_dims=32)


@pytest.fixture(scope="module")
def twin_and_flax():
    torch.manual_seed(42)
    twin = build_torch_twin(CFG)
    variables = import_danet_torch(twin.state_dict(), CFG)
    model = DANet(params_cfg=CFG)
    return twin, model, variables


def test_latent_parity(twin_and_flax):
    twin, model, variables = twin_and_flax
    x = torch.randn(2, CFG.input_channel, 64, 96)
    with torch.no_grad():
        ref = twin.latent(x).numpy()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = model.apply(variables, xj, method=DANet.latent)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-4)


def test_full_forward_parity(twin_and_flax):
    twin, model, variables = twin_and_flax
    x = torch.randn(2, CFG.input_channel, 64, 96)
    speed = torch.rand(2, 1)
    with torch.no_grad():
        cam, route, light, bc = twin(x, speed)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = model.apply(variables, xj, jnp.asarray(speed.numpy()))
    np.testing.assert_allclose(np.asarray(out["camera"]),
                               cam.numpy().transpose(0, 2, 3, 1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["route"]),
                               route.numpy().transpose(0, 2, 3, 1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["light_state"]), light.numpy(),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["steer"]), bc[:, 0].numpy(),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["throttle"]), bc[:, 1].numpy(),
                               atol=2e-3)


def test_production_shape_state_dict_loads():
    """Full-size (144x256, C=512, z=256) checkpoint import is shape-correct."""
    cfg = danet_params()
    torch.manual_seed(0)
    twin = build_torch_twin(cfg)
    variables = import_danet_torch(twin.state_dict(), cfg)
    model = DANet(params_cfg=cfg)
    x = jnp.zeros((1, 144, 256, 4))
    z = model.apply(variables, x, method=DANet.latent)
    assert z.shape == (1, 512)
