"""Device-env scripted expert: the capability bound for the route banks
(cadre_tpu/envs/jax_expert.py). If these completions are high, the RL
plateau is a learning problem, not an env/actuator problem."""
import numpy as np

from cadre_tpu.envs.jax_env import JaxEnvConfig, make_route_bank
from cadre_tpu.envs.jax_expert import expert_episode_stats


def test_expert_completes_clean_routes():
    """No traffic, lights obeyed: the expert should essentially always
    finish the standard 3-leg synthetic routes at LUT granularity."""
    bank = make_route_bank(4, seed=0)
    cfg = JaxEnvConfig(render=False, n_vehicles=0, n_walkers=0,
                       randomize_weather=False)
    comp, err = expert_episode_stats(bank, num_envs=8, steps=1800,
                                     seed=0, config=cfg)
    assert len(comp) >= 8
    assert np.mean(comp) > 0.95, (np.mean(comp),
                                  np.unique(err, return_counts=True))
    assert np.mean(err == 6) > 0.9          # ERROR_CODES[6] = success


def test_expert_handles_junction_dense_routes():
    """The junction-dense shape (6 short legs) that RL stalls on: the
    expert takes every corner."""
    bank = make_route_bank(4, seed=1, route_legs=6,
                           route_leg_len=(25.0, 45.0))
    cfg = JaxEnvConfig(render=False, n_vehicles=0, n_walkers=0,
                       randomize_weather=False)
    comp, err = expert_episode_stats(bank, num_envs=8, steps=2500,
                                     seed=1, config=cfg)
    assert len(comp) >= 8
    assert np.mean(comp) > 0.9, (np.mean(comp),
                                 np.unique(err, return_counts=True))
