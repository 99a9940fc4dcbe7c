"""In-graph priority route curriculum on the device env.

Contract: PriorityRouteIndexer (leaderboard/utils/priority_route_indexer.py)
— priorities init at 100, update_route sets priority[route] =
100 - completion% at episode end (:42-49), and next() draws 20% uniform
else softmax over the priority vector (:51-61). The device twin keeps the
table per env (env ≙ reference worker) inside JaxEnvState.route_prio and
samples in `_reset_one` when JaxEnvConfig.priority_routes is set.
"""
import jax
import jax.numpy as jnp
import numpy as np

from cadre_tpu.envs.jax_env import (
    JaxEnvConfig,
    RouteBank,
    _reset_one,
    _step_one,
)


def _multi_route_bank(n_routes=4, length=80) -> RouteBank:
    """n straight +x routes at distinct y offsets."""
    n = length + 1
    routes = np.zeros((n_routes, n + 80, 2), np.float32)
    cums = np.ones((n_routes, n + 80), np.float32)
    for r in range(n_routes):
        dense = np.stack([np.arange(n, dtype=np.float32),
                          np.full(n, 1000.0 * r, np.float32)], axis=-1)
        routes[r, :n] = dense
        routes[r, n:] = dense[-1]
        cum = np.concatenate([[0.0], np.cumsum(
            np.hypot(*(np.diff(dense, axis=0).T)))]) / length
        cums[r, :n] = cum
    return RouteBank(
        jnp.asarray(routes),
        jnp.asarray(np.full(n_routes, n, np.int32)),
        jnp.asarray(cums),
        jnp.asarray(np.full((n_routes, 8, 5), 1e8, np.float32)),
        jnp.asarray(np.full((n_routes, 2, 5), 1e8, np.float32)),
        jnp.asarray(np.full((n_routes, 1, 6), 1e8, np.float32)))


def _sample_routes(cfg, bank, prio, n=400):
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    reset = jax.vmap(lambda k: _reset_one(cfg, bank, k, prio).route_id)
    return np.asarray(jax.jit(reset)(keys))


def test_priority_sampling_prefers_high_priority_routes():
    bank = _multi_route_bank()
    cfg = JaxEnvConfig(priority_routes=True, n_vehicles=0, n_walkers=0,
                       randomize_weather=False, render=False)
    prio = jnp.asarray([0.0, 0.0, 0.0, 50.0])
    ids = _sample_routes(cfg, bank, prio)
    freq = np.bincount(ids, minlength=4) / len(ids)
    # softmax(0,0,0,50) ~ route 3; 20% of draws are uniform:
    # expect ~0.8 + 0.2/4 = 0.85 for route 3, ~0.05 each for the rest
    assert freq[3] > 0.7
    assert all(freq[r] > 0.005 for r in range(3)), freq


def test_uniform_sampling_when_flag_off():
    bank = _multi_route_bank()
    cfg = JaxEnvConfig(priority_routes=False, n_vehicles=0, n_walkers=0,
                       randomize_weather=False, render=False)
    # the table is ignored: same skewed priorities, uniform draw
    prio = jnp.asarray([0.0, 0.0, 0.0, 50.0])
    ids = _sample_routes(cfg, bank, prio)
    freq = np.bincount(ids, minlength=4) / len(ids)
    assert all(abs(f - 0.25) < 0.1 for f in freq), freq


def test_priority_updates_to_100_minus_completion_at_episode_end():
    bank = _multi_route_bank(n_routes=2)
    cfg = JaxEnvConfig(priority_routes=True, n_vehicles=0, n_walkers=0,
                       randomize_weather=False, render=False)
    state = _reset_one(cfg, bank, jax.random.PRNGKey(1),
                       jnp.asarray([100.0, 100.0]))
    route = int(state.route_id)
    step = jax.jit(lambda s, c: _step_one(cfg, bank, s, c))
    # full throttle + hard right: deviates off the straight route within
    # the deviation threshold long before completing it
    done, out = False, None
    for _ in range(200):
        state, out = step(state, jnp.asarray([1.0, 1.0, 0.0], jnp.float32))
        if bool(out.done):
            done = True
            break
    assert done, "episode should end in route deviation"
    expected = 100.0 * (1.0 - float(out.completion))
    got = float(state.route_prio[route])
    assert abs(got - expected) < 1e-4, (got, expected)
    # the untouched route keeps its init priority
    assert float(state.route_prio[1 - route]) == 100.0
