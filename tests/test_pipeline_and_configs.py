"""Async prefetcher, config files, and route generator tests."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cadre_tpu.rl.pipeline import DevicePrefetcher
from cadre_tpu.utils.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_prefetcher_yields_all_in_order():
    items = [{"a": np.full((4,), i, np.float32)} for i in range(7)]
    out = list(DevicePrefetcher(items, depth=2))
    assert len(out) == 7
    for i, item in enumerate(out):
        assert isinstance(item["a"], jax.Array)
        np.testing.assert_allclose(np.asarray(item["a"]), i)


def test_prefetcher_propagates_errors():
    def gen():
        yield {"a": np.zeros(2)}
        raise RuntimeError("producer failed")

    pf = DevicePrefetcher(gen())
    next(pf)
    with pytest.raises(RuntimeError, match="producer failed"):
        next(pf)


def test_config_files_load():
    cfg = Config.fromfile(os.path.join(REPO, "config_files",
                                       "agent_config.py"))
    assert cfg.rollout_cfg.num_steps == 200
    assert cfg.agent_cfg.model_cfg.command_num == 4
    assert len(cfg.STEER_CONTROL) == 33
    ecfg = Config.fromfile(os.path.join(REPO, "config_files",
                                        "eval_agent_config.py"))
    # inherits training values, overrides eval ones
    assert ecfg.rollout_cfg.num_steps == 200
    assert ecfg.env_cfg.training is False
    assert ecfg.env_cfg.amount == [20, 50]
    assert ecfg.eval_cfg.eval_episode == 25


def test_route_generator(tmp_path):
    out = str(tmp_path / "routes")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_routes.py"),
         "--out", out, "--per-family", "2"],
        check=True, capture_output=True,
        env=dict(os.environ, PALLAS_AXON_POOL_IPS=""))
    from cadre_tpu.envs.indexer import PriorityRouteIndexer
    from cadre_tpu.envs.route_parser import parse_scenario_file

    idx = PriorityRouteIndexer(os.path.join(out, "nocrash_left_turn.xml"))
    assert len(idx) == 4  # 2 routes x2 traffic variants
    cfg = idx.next()
    assert len(cfg.trajectory) >= 3
    anns = parse_scenario_file(os.path.join(out, "scenarios.json"))
    assert len(anns) > 0
    assert anns[0]["type"].startswith("Scenario")
