"""On-device K-checkpoint ensemble eval (cadre_tpu/rl/device_eval.py)."""
import jax
import pytest

from cadre_tpu.configs.danet_config import danet_params
from cadre_tpu.envs.jax_env import (
    JaxDrivingEnv,
    JaxEnvConfig,
    make_route_bank,
)
from cadre_tpu.rl.agent import CadreAgent


@pytest.mark.slow
def test_device_ensemble_eval_reports_episodes(tmp_path):
    from cadre_tpu.rl.device_eval import evaluate_device

    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=danet_params(
        da_feature_channel=32, inter_att_dims=24, z_dims=16))
    p = str(tmp_path / "a.msgpack")
    agent.save_snapshot(p)
    # deliberately hand evaluate_device a TRAINING-mode env: the
    # eval-hygiene lock must coerce it to eval mode, so training-only
    # termination rules ("exceed speed", env_wrapper.py:435-441) can
    # never appear in an eval artifact (the round-3 camroute leak).
    env = JaxDrivingEnv(make_route_bank(3, seed=1), num_envs=2,
                        config=JaxEnvConfig(max_block_steps=60))
    eps = evaluate_device(agent, env, [p, p], max_steps=160)
    # a random coasting ensemble must hit the blocked timeout in both envs
    assert len(eps) >= 2
    for e in eps:
        assert 0.0 <= e["completion"] <= 1.0
        assert e["error"] in ("vehicle blocked", "route deviation",
                              "collision vehicles!", "collision static",
                              "collision pedestrians!", "success",
                              "route timeout")
        assert e["error"] != "exceed speed"
        assert e["steps"] > 0
        assert 0.0 <= e["driving_score"] <= 100.0
        if e["error"] == "vehicle blocked":
            assert e["driving_score"] == pytest.approx(
                100.0 * e["completion"])
