"""Parity against the ACTUAL reference PyTorch source at /root/reference.

Round-1 parity was asserted against builder-authored torch twins; these tests
remove that self-reference: they import the real `Networks/danet.py:72` DANet
(with the production auto_danet net_params), the real `ppo_agent/models.py`
Model/LSTM, transfer weights through our checkpoint importers, and assert the
flax forwards reproduce the torch outputs. The reference's optional debug /
viz dependencies (torchsnooper, torchvision, tensorboardX, skimage, cv2)
are stubbed — none are touched by the forward paths under test.
"""
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "carla_perception")),
    reason="reference source tree not mounted")


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def reference():
    os.environ.setdefault("CHALLENGE_DIR", REFERENCE)
    _stub("torchsnooper", snoop=lambda *a, **k: (lambda f: f))
    tv = _stub("torchvision")
    tv.transforms = _stub("torchvision.transforms")
    _stub("tensorboardX", SummaryWriter=object)
    sk = _stub("skimage")
    sk.io = _stub("skimage.io")
    _stub("cv2")
    mpl = _stub("matplotlib")
    mpl.pyplot = _stub("matplotlib.pyplot")
    for p in (REFERENCE, os.path.join(REFERENCE, "carla_perception")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    danet_mod = importlib.import_module("Networks.danet")
    models_mod = importlib.import_module("ppo_agent.models")
    return danet_mod, models_mod


# the production net_params dict auto_danet.py:104-160 assembles for
# input mode 9 / output mode 12 (1 camera + route + bc_speed -> 4 channels;
# camera seg + route + light state + BC heads)
NET_PARAMS = {
    "net_name": "autoencoder", "model_name": "danet",
    "input_channel": 4, "camera_output_channel": 8,
    "left_camera_output_channel": 3, "right_camera_output_channel": 3,
    "light_classes_num": 4, "z_dims": 256, "att_type": "transformer",
    "da_feature_channel": 512, "inter_att_dims": 512,
    "pred_light_state": True, "pred_light_dist": False, "pred_lidar": False,
    "pred_topdown_rgb": False, "pred_topdown_seg": False, "pred_route": True,
    "pred_camera_seg": True, "pred_left_camera_seg": False,
    "pred_right_camera_seg": False, "pred_bc": True, "in_bc_speed": True,
    "pretrained": False, "pretrained_path": None,
}


@pytest.fixture(scope="module")
def danet_pair(reference):
    danet_mod, _ = reference
    from cadre_tpu.configs.danet_config import danet_params
    from cadre_tpu.models.danet import DANet
    from cadre_tpu.utils.checkpoint import import_danet_torch

    torch.manual_seed(7)
    ref = danet_mod.DANet(NET_PARAMS).eval()
    cfg = danet_params()
    variables = import_danet_torch(ref.state_dict(), cfg)
    model = DANet(params_cfg=cfg)
    return ref, model, variables


@pytest.mark.slow
def test_reference_danet_latent_parity(danet_pair):
    ref, model, variables = danet_pair
    from cadre_tpu.models.danet import DANet

    torch.manual_seed(0)
    x = torch.randn(2, 4, 144, 256)
    with torch.no_grad():
        want = ref.get_latent_feature(x, "concate").numpy()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = np.asarray(model.apply(variables, xj, method=DANet.latent))
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


@pytest.mark.slow
def test_reference_danet_forward_heads_parity(danet_pair):
    ref, model, variables = danet_pair
    torch.manual_seed(1)
    x = torch.randn(2, 4, 144, 256)
    speed = torch.rand(2, 1)
    with torch.no_grad():
        (light, light_dist, image, lidar, topdown, route,
         left, right, steer, throttle) = ref(x, speed)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = model.apply(variables, xj, jnp.asarray(speed.numpy()))
    np.testing.assert_allclose(np.asarray(out["light_state"]),
                               light.numpy(), rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["camera"]),
                               image.numpy().transpose(0, 2, 3, 1),
                               rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["route"]),
                               route.numpy().transpose(0, 2, 3, 1),
                               rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["steer"]), steer.numpy(),
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["throttle"]), throttle.numpy(),
                               rtol=5e-3, atol=1e-3)


def test_reference_policy_bank_parity(reference):
    _, models_mod = reference
    from cadre_tpu.models.policy import LSTMModel, PolicyBankDef
    from cadre_tpu.utils.checkpoint import import_policy_torch

    torch.manual_seed(3)
    F_DIM, A = 530, 33
    snapshot = {}
    refs = {}
    for signal, nout in [("steer", A), ("throttle", 3)]:
        for k in range(4):
            m = models_mod.Model(F_DIM, nout, trainable=False)
            lstm = models_mod.LSTM(F_DIM, F_DIM).eval()
            snapshot[f"{signal}_ppo_{k}"] = m
            snapshot[f"{signal}_lstm_{k}"] = lstm
            refs[(signal, k)] = (m, lstm)

    steer_def = PolicyBankDef(4, A, F_DIM)
    throttle_def = PolicyBankDef(4, 3, F_DIM)
    params, missing = import_policy_torch(
        snapshot, steer_def.init_params(jax.random.PRNGKey(0)),
        throttle_def.init_params(jax.random.PRNGKey(1)))
    assert missing == []

    x = torch.randn(3, F_DIM)
    xj = jnp.asarray(x.numpy())
    for signal, bank_def in [("steer", steer_def),
                             ("throttle", throttle_def)]:
        for k in range(4):
            m, lstm = refs[(signal, k)]
            with torch.no_grad():
                # reference Model.act: critic value + the raw actor-MLP
                # logits (Categorical_1d.linear; torch's Categorical then
                # log-normalizes them, which our distribution layer also
                # does downstream)
                ref_value = m.critic(x).numpy()
                ref_logits = m.control.linear(x).numpy()
                ref_h, ref_c = lstm.rnn(
                    x, (torch.zeros(3, F_DIM), torch.zeros(3, F_DIM)))
            sel = jax.tree.map(lambda p: p[k], params[signal])
            ac, lstm_m = bank_def.make_modules()
            logits, value = ac.apply({"params": sel["ac"]}, xj)
            np.testing.assert_allclose(np.asarray(logits), ref_logits,
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(value), ref_value,
                                       rtol=1e-4, atol=1e-5)
            carry, feat = lstm_m.apply(
                {"params": sel["lstm"]}, xj[None],
                (jnp.zeros((3, F_DIM)), jnp.zeros((3, F_DIM))),
                method=LSTMModel.unroll)
            np.testing.assert_allclose(np.asarray(feat), ref_h.numpy(),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(carry[1]), ref_c.numpy(),
                                       rtol=1e-4, atol=1e-5)
