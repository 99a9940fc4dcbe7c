"""Multi-checkpoint ensemble evaluation.

Contract: eval.py:12-64 — load K snapshots (recommended 6-8), act all per
step, average controls with brake thresholding (agent.py:83-95), run
`eval_episode` episodes, append per-route completion ratios to
eval_completion_ratio.csv (handled by the env). TPU-native: the K agents are
one vmap axis (rl/agent.EnsembleAgent), so the K cascade forwards the
reference runs sequentially are a single fused device step.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax

from cadre_tpu.configs.agent_config import EvalConfig, avg_action
from cadre_tpu.rl.agent import CadreAgent, EnsembleAgent
from cadre_tpu.utils.logger import logger


@dataclasses.dataclass
class EvalEpisodeResult:
    episode: int
    steps: int
    completion_ratio: float
    error_message: str
    driving_score: float = 0.0


def evaluate(env, agent: CadreAgent, snapshot_paths: Sequence[str],
             eval_cfg: Optional[EvalConfig] = None, seed: int = 0,
             max_steps: int = 6000,
             result_file: Optional[str] = None) -> List[EvalEpisodeResult]:
    """`result_file` mirrors the reference ScenarioManager's per-criterion
    CSV (scenario_manager.py:85-91): one actual_value row per episode."""
    from cadre_tpu.envs.scoring import StatisticsManager, write_criteria_csv

    eval_cfg = eval_cfg or EvalConfig()
    ens = EnsembleAgent(agent, list(snapshot_paths))
    rng = jax.random.PRNGKey(seed)
    results: List[EvalEpisodeResult] = []
    stats = StatisticsManager()
    for episode in range(eval_cfg.eval_episode):
        obs = env.reset()
        done, steps = False, 0
        msg = ""
        while not done and steps < max_steps:
            rng, key = jax.random.split(rng)
            actions = ens.act(obs, key)
            control = avg_action(actions, eval_cfg.brake_threshold)
            obs, _, done, info = env.step(control)
            msg = info.get("error_message", "")
            steps += 1
        ratio = getattr(env, "completion_ratio", 0.0)
        score = ratio
        criteria = getattr(env, "_criteria", None)
        if criteria:
            rec = stats.compute(str(getattr(env, "route_name", episode)),
                                criteria)
            score = rec.score
            if not done:  # episode cut by max_steps: use live progress
                ratio = rec.completion
            if result_file:
                write_criteria_csv(result_file, criteria)
        results.append(EvalEpisodeResult(episode, steps, ratio, msg, score))
        logger.log(f"eval episode {episode}: {steps} steps, completion "
                   f"{ratio:.1f}%, driving score {score:.1f}, end: {msg!r}")
    if stats.records:
        g = stats.global_record()
        logger.log(
            f"driving score over {g['routes']} routes: composed "
            f"{g['score_composed']:.1f} (route {g['score_route']:.1f} x "
            f"penalty {g['score_penalty']:.2f})")
    return results
