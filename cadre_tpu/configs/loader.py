"""Bridge Config.fromfile python configs to the typed dataclass configs."""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

from cadre_tpu.configs.agent_config import (
    AgentConfig,
    EvalConfig,
    RolloutConfig,
    TrainConfig,
)
from cadre_tpu.utils.config import Config, ConfigDict


def _fill(dc_cls, src: Dict[str, Any]):
    """Instantiate a dataclass from matching keys of a config dict."""
    names = {f.name for f in dataclasses.fields(dc_cls)}
    return dc_cls(**{k: v for k, v in src.items() if k in names})


def load_experiment(path: str) -> Dict[str, Any]:
    """Load a config_files/*.py experiment into typed configs.

    Returns {'rollout': RolloutConfig, 'agent': AgentConfig,
             'train': TrainConfig, 'env': dict, 'eval': EvalConfig|None,
             'raw': ConfigDict}.
    """
    cfg = Config.fromfile(path)
    rollout = _fill(RolloutConfig, dict(cfg.get("rollout_cfg", {})))
    agent_src = dict(cfg.get("agent_cfg", {}))
    model_cfg = dict(agent_src.pop("model_cfg", {}))
    agent = AgentConfig(
        use_lstm=model_cfg.get("use_lstm", True),
        command_num=model_cfg.get("command_num", 4),
        measurement_dim=model_cfg.get("measurement_dim", 18),
        frame=agent_src.get("frame", 8),
        ent_coeff=agent_src.get("ent_coeff", 0.01),
        value_coeff=agent_src.get("value_coeff", 0.1),
        clip_coeff=agent_src.get("clip_coeff", 1.0),
        clip=agent_src.get("clip", 0.1),
        vae_params=model_cfg.get("vae_params", "CoPM"),
        ordinal=model_cfg.get("ordinal", False),
    )
    train_src = dict(cfg.get("train_cfg", {}))
    if "num_processes" in dict(cfg.get("env_cfg", {})):
        train_src.setdefault("num_processes",
                             cfg.env_cfg["num_processes"])
    train = _fill(TrainConfig, train_src)
    eval_cfg = None
    if "eval_cfg" in cfg:
        src = dict(cfg.eval_cfg)
        eval_cfg = EvalConfig(
            eval_episode=src.get("eval_episode", 25),
            load_episodes=tuple(src.get("load_episode",
                                        EvalConfig.load_episodes)),
            brake_threshold=src.get("brake_threshold", 0.5),
        )
    return {"rollout": rollout, "agent": agent, "train": train,
            "env": dict(cfg.get("env_cfg", {})), "eval": eval_cfg,
            "raw": cfg}
