"""CadreAgent cascade tests: act, bootstrap value, update, snapshot, ensemble."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cadre_tpu.configs.agent_config import (
    AgentConfig,
    avg_action,
    convert_action,
)
from cadre_tpu.configs.danet_config import danet_params
from cadre_tpu.rl.agent import CadreAgent, EnsembleAgent, preprocess_obs


SMALL_DANET = danet_params(image_height=64, image_width=96, feat_h=2,
                           feat_w=3, da_feature_channel=64,
                           inter_att_dims=48, z_dims=32)


@pytest.fixture(scope="module")
def agent():
    # z=32 -> obs_dim = 2*32+18 = 82 with the small encoder
    return CadreAgent.create(jax.random.PRNGKey(0), agent_cfg=AgentConfig(),
                             danet_cfg=SMALL_DANET)


def _tick(T=8):
    rng = np.random.RandomState(0)
    return {
        "rgb": rng.randint(0, 255, (T, 64, 96, 3)).astype(np.uint8),
        "route_fig": (rng.rand(T, 96, 64) * 255).astype(np.uint8),
        "measurements": rng.rand(T, 3).astype(np.float32),
        "command": 2,
    }


def test_preprocess_shapes_and_range():
    tick = _tick()
    x = preprocess_obs(jnp.asarray(tick["rgb"]),
                       jnp.asarray(tick["route_fig"]))
    assert x.shape == (8, 64, 96, 4)
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0


def test_preprocess_zero_route_no_nan():
    x = preprocess_obs(jnp.zeros((2, 64, 96, 3)), jnp.zeros((2, 96, 64)))
    assert not bool(jnp.isnan(x).any())


def test_act_and_value(agent):
    tick = _tick()
    out = agent.act(tick, jax.random.PRNGKey(1))
    assert out.features.shape == (8, agent.obs_dim)
    assert 0 <= int(out.steer_action) < 33
    assert 0 <= int(out.throttle_action) < 3
    assert np.isfinite(float(out.steer_log_prob))
    sv, tv = agent.get_value(False, (out.features, 2), (out.features, 2))
    assert np.isfinite(float(sv)) and np.isfinite(float(tv))
    zv, ztv = agent.get_value(True, None, None)
    assert float(zv) == 0.0 and float(ztv) == 0.0


def test_act_deterministic_given_rng(agent):
    tick = _tick()
    a1 = agent.act(tick, jax.random.PRNGKey(5))
    a2 = agent.act(tick, jax.random.PRNGKey(5))
    assert int(a1.steer_action) == int(a2.steer_action)
    assert float(a1.steer_value) == float(a2.steer_value)


def test_snapshot_roundtrip(tmp_path, agent):
    path = str(tmp_path / "snap.msgpack")
    agent.save_snapshot(path)
    before = jax.tree_util.tree_leaves(agent.params)[0].copy()
    # perturb then restore
    agent.params = jax.tree.map(lambda p: p + 1.0, agent.params)
    agent.load_snapshot(path)
    after = jax.tree_util.tree_leaves(agent.params)[0]
    np.testing.assert_allclose(np.asarray(before), np.asarray(after))


def test_ensemble_vmap(tmp_path, agent):
    p1 = str(tmp_path / "s1.msgpack")
    p2 = str(tmp_path / "s2.msgpack")
    agent.save_snapshot(p1)
    agent.params = jax.tree.map(lambda p: p * 1.01, agent.params)
    agent.save_snapshot(p2)
    ens = EnsembleAgent(agent, [p1, p2])
    actions = ens.act(_tick(), jax.random.PRNGKey(2))
    assert len(actions) == 2
    control = avg_action(actions)
    assert len(control) == 3
    assert -1.0 <= control[0] <= 1.0


def test_action_luts():
    assert convert_action(8, 0) == [0.0, 0.0, 0.0]
    assert convert_action(31, 2) == [1.0, 0.6, 0.0]
    assert convert_action(32, 1) == [-1.0, 0.0, 1.0]
    # ensemble brake thresholding (agent.py:91-94)
    c = avg_action([(8, 1), (8, 0)])  # brakes 1.0 and 0.0 -> mean 0.5 kept
    assert c[2] == 0.5
    c = avg_action([(8, 1), (8, 0), (8, 0)])  # mean 1/3 < 0.5 -> zeroed
    assert c[2] == 0.0


def test_bf16_encoder_agent():
    import jax.numpy as jnp

    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=SMALL_DANET,
                              bf16_encoder=True)
    leaf = jax.tree_util.tree_leaves(agent.danet_vars["params"])[0]
    assert leaf.dtype == jnp.bfloat16
    out = agent.act(_tick(), jax.random.PRNGKey(1))
    assert out.features.dtype == jnp.float32
    assert np.isfinite(float(out.steer_log_prob))


def test_loaded_params_are_device_committed(tmp_path, agent):
    """Checkpoint loaders hand back host numpy pytrees; the agent must
    commit them to device once at load time — numpy leaves are re-uploaded
    on EVERY jit dispatch (129 MB/tick for the production encoder on a
    remote-TPU link, measured ~1.3 s/tick)."""
    path = str(tmp_path / "snap.msgpack")
    agent.save_snapshot(path)
    agent.load_snapshot(path)
    for leaf in jax.tree_util.tree_leaves(agent.params):
        assert isinstance(leaf, jax.Array), type(leaf)

    # encoder vars passed into create() as numpy must come out device-side
    np_vars = jax.tree.map(np.asarray, agent.danet_vars)
    a2 = CadreAgent.create(jax.random.PRNGKey(1), danet_cfg=SMALL_DANET,
                           danet_vars=np_vars)
    for leaf in jax.tree_util.tree_leaves(a2.danet_vars):
        assert isinstance(leaf, jax.Array), type(leaf)


def test_preprocess_blank_route_zeros_plane():
    """in_route_blank (camera-route experiment): the route plane is zeroed
    while the rgb channels are untouched."""
    tick = _tick()
    xb = preprocess_obs(jnp.asarray(tick["rgb"]),
                        jnp.asarray(tick["route_fig"]), blank_route=True)
    x = preprocess_obs(jnp.asarray(tick["rgb"]),
                       jnp.asarray(tick["route_fig"]))
    assert float(jnp.abs(xb[..., 3]).max()) == 0.0
    assert float(jnp.abs(x[..., 3]).max()) > 0.0
    assert np.allclose(np.asarray(xb[..., :3]), np.asarray(x[..., :3]))


def test_camera_route_agent_invariant_to_route_fig():
    """A camera-route agent's latent features must not depend on the route
    raster at all — the whole point of the round-3 protocol is that route
    geometry can only enter through the rgb camera."""
    cfg = danet_params(image_height=64, image_width=96, feat_h=2,
                       feat_w=3, da_feature_channel=64,
                       inter_att_dims=48, z_dims=32, in_route_blank=True)
    ag = CadreAgent.create(jax.random.PRNGKey(0), agent_cfg=AgentConfig(),
                           danet_cfg=cfg)
    t1 = _tick()
    t2 = dict(t1)
    t2["route_fig"] = (np.random.RandomState(9).rand(8, 96, 64)
                       * 255).astype(np.uint8)
    f1 = np.asarray(ag.act(t1, jax.random.PRNGKey(3)).features)
    f2 = np.asarray(ag.act(t2, jax.random.PRNGKey(3)).features)
    assert np.allclose(f1, f2)
