"""End-to-end training-loop smoke + logger/config tests."""
import os

import numpy as np
import pytest

import jax

from cadre_tpu.configs.agent_config import AgentConfig, RolloutConfig, TrainConfig
from cadre_tpu.configs.danet_config import danet_params
from cadre_tpu.envs.fake_env import FakeDrivingEnv
from cadre_tpu.rl.agent import CadreAgent
from cadre_tpu.rl.train import train
from cadre_tpu.utils.config import Config, ConfigDict
from cadre_tpu.utils.logger import Logger


SMALL = danet_params(image_height=64, image_width=96, feat_h=2, feat_w=3,
                     da_feature_channel=64, inter_att_dims=48, z_dims=32)


def test_train_two_episodes_fake_env(tmp_path):
    env = FakeDrivingEnv(episode_length=12, seq_length=3, height=64, width=96)
    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=SMALL)
    rollout_cfg = RolloutConfig(num_steps=8, mini_batch_num=2, seq_length=3,
                                feature_dims=agent.obs_dim)
    train_cfg = TrainConfig(ppo_epoch=2, save_interval=1, log_interval=1)
    stats = train(env, agent, rollout_cfg, train_cfg, rank=0,
                  work_dir=str(tmp_path), max_episode=2)
    assert len(stats) == 2
    for s in stats:
        assert np.isfinite(s.value_loss)
        assert np.isfinite(s.policy_loss)
    # snapshots written
    assert os.path.exists(tmp_path / "0" / "models" / "ppo_model_0.msgpack")
    assert os.path.exists(tmp_path / "0" / "models" / "ppo_model_1.msgpack")


def test_evaluate_ensemble_fake_env(tmp_path):
    from cadre_tpu.configs.agent_config import EvalConfig
    from cadre_tpu.rl.evaluate import evaluate

    env = FakeDrivingEnv(episode_length=6, seq_length=3, height=64, width=96)
    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=SMALL)
    p1, p2 = str(tmp_path / "a.msgpack"), str(tmp_path / "b.msgpack")
    agent.save_snapshot(p1)
    agent.save_snapshot(p2)
    results = evaluate(env, agent, [p1, p2], EvalConfig(eval_episode=2),
                       max_steps=10)
    assert len(results) == 2
    assert results[0].completion_ratio == 100.0


def test_logger_tabular(tmp_path):
    lg = Logger()
    lg.setup(str(tmp_path))
    lg.log("hello", stdout=False)
    lg.record_tabular("a", 1)
    lg.record_tabular("b", 2.5)
    lg.dump_tabular()
    lg.record_tabular("a", 3)
    lg.record_tabular("b", 4.5)
    lg.dump_tabular()
    rows = open(tmp_path / "progress.csv").read().strip().split("\n")
    assert rows[0] == "a,b"
    assert rows[1] == "1,2.5"
    assert rows[2] == "3,4.5"
    assert "hello" in open(tmp_path / "debug.log").read()


def test_config_fromfile_with_base(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("train_cfg = dict(lr=3e-4, epochs=4)\nname='base'\n")
    child = tmp_path / "child.py"
    child.write_text(
        "_base_ = 'base.py'\ntrain_cfg = dict(lr=1e-4)\nextra = [1, 2]\n")
    cfg = Config.fromfile(str(child))
    assert cfg.name == "base"
    assert cfg.train_cfg.lr == 1e-4
    assert cfg.train_cfg.epochs == 4
    assert cfg.extra == [1, 2]
    cfg2 = Config.merge_args(cfg, {"train_cfg.lr": 5e-5, "new.flag": True})
    assert cfg2.train_cfg.lr == 5e-5
    assert cfg2.new.flag is True
