"""Route-driving background traffic (CARLA traffic-manager autopilot,
route_scenario.py:473-495): NPC vehicles must DRIVE the route with
car-following and red-light stops on both the host and device paths.

Parked-forever NPCs were the diagnosed ~35%-completion floor of the 9.6M-step
device-scale arms: the ego reward-farms behind a car that never moves until
route timeout (the obstacle shaping + detect-refreshed block timer of
env_wrapper.py:443-476 make stopping behind a permanent obstacle a stable
optimum)."""
import jax
import jax.numpy as jnp
import numpy as np

from cadre_tpu.envs.jax_env import (
    JaxDrivingEnv,
    JaxEnvConfig,
    RouteBank,
    make_route_bank,
)
from cadre_tpu.envs.sim_env import SimDrivingEnv
from cadre_tpu.envs.traffic_lights import RED


def _straight_bank(length=300):
    n = length
    routes = np.zeros((1, n + 80, 2), np.float32)
    routes[0, :, 0] = np.arange(n + 80, dtype=np.float32)
    cums = np.ones((1, n + 80), np.float32)
    cums[0, :n] = np.linspace(0.0, 1.0, n)
    return RouteBank(jnp.asarray(routes), jnp.asarray([n], np.int32),
                     jnp.asarray(cums),
                     jnp.asarray(np.full((1, 8, 5), 1e8, np.float32)),
                     jnp.asarray(np.full((1, 2, 5), 1e8, np.float32)),
                     jnp.asarray(np.full((1, 1, 6), 1e8, np.float32)))


def test_device_npcs_drive_the_route():
    bank = make_route_bank(2, seed=0)
    env = JaxDrivingEnv(bank, num_envs=4,
                        config=JaxEnvConfig(render=False))
    st, _ = env.reset(jax.random.PRNGKey(0))
    s0 = np.asarray(st.npc_s)
    ctrl = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (4, 1))  # ego parked
    for _ in range(100):
        st, out = env.step(st, ctrl)
    s1 = np.asarray(st.npc_s)
    bound = s0 >= 0
    assert bound.any()
    adv = (s1 - s0)[bound]
    # at least half the fleet is cruising (>=10 m over 10 s); the rest may
    # be queued behind a slower leader or a red light
    assert (adv >= 10.0).mean() >= 0.5, adv
    assert (adv >= -1.5).all(), adv          # only the end-clamp goes back


def test_device_npc_car_following_keeps_gap():
    bank = _straight_bank()
    env = JaxDrivingEnv(bank, num_envs=1,
                        config=JaxEnvConfig(render=False, n_vehicles=2,
                                            n_walkers=0))
    st, _ = env.reset(jax.random.PRNGKey(1))
    # leader at 50 m cruising slow, follower 6 m behind wanting to go fast
    obs = np.array(st.obstacles)
    obs[0, 0] = [50.0, 0.0, 1.2, 0.0, 2.0, 0.0]
    obs[0, 1] = [44.0, 0.0, 1.2, 0.0, 6.0, 0.0]
    st = st._replace(
        obstacles=jnp.asarray(obs),
        npc_s=jnp.asarray([[50.0, 44.0]], jnp.float32),
        npc_cruise=jnp.asarray([[2.0, 6.0]], jnp.float32))
    ctrl = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 1))
    for _ in range(80):
        st, out = env.step(st, ctrl)
        if bool(np.asarray(out.done)[0]):
            raise AssertionError("episode ended unexpectedly")
        s = np.asarray(st.npc_s)[0]
        assert s[0] - s[1] > 1.5, s          # never rear-ends the leader
    s = np.asarray(st.npc_s)[0]
    assert s[0] > 60.0                       # leader cruised on
    assert s[1] > 50.0                       # follower kept moving too


def test_device_npc_stays_on_route_line():
    bank = make_route_bank(1, seed=3)
    env = JaxDrivingEnv(bank, num_envs=1,
                        config=JaxEnvConfig(render=False))
    st, _ = env.reset(jax.random.PRNGKey(2))
    ctrl = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 1))
    route = np.asarray(bank.routes[0])
    rlen = int(bank.route_len[0])
    for _ in range(60):
        st, _out = env.step(st, ctrl)
    obs = np.asarray(st.obstacles)[0]
    bound = np.asarray(st.npc_s)[0] >= 0
    for xy in obs[bound, :2]:
        d = np.linalg.norm(route[:rlen] - xy, axis=-1).min()
        assert d < 0.6, (xy, d)


def test_host_npc_stops_at_red_light():
    env = SimDrivingEnv(seed=7, vehicle_num=(0, 0), seq_length=1)
    env.reset()
    dense = env._route_xy
    # place a frozen-red light 20 m ahead of a hand-spawned route vehicle
    from cadre_tpu.envs.traffic_lights import StopLine, TrafficLightInfo
    i_v, i_l = 40, 60
    seg = dense[i_l + 1] - dense[i_l]
    d = seg / np.linalg.norm(seg)
    env._lights = [TrafficLightInfo(
        uid=0, center=dense[i_l].astype(float),
        stop_lines=[StopLine(pos=dense[i_l].astype(float), dir=d,
                             lane_width=3.5)],
        frozen=RED)]
    from cadre_tpu.envs.sim_env import SimObstacle
    ob = SimObstacle(pos=dense[i_v].astype(float).copy(), radius=1.2,
                     kind="vehicle", speed=6.0, route_s=float(i_v),
                     cruise=6.0)
    env._obstacles.append(ob)
    for _ in range(100):
        env.step([0.0, 0.0, 1.0])
    assert ob.speed < 0.5                     # held at the light
    assert ob.route_s < i_l                   # never crossed the stop line
    # light released -> traffic flows again
    env._lights[0].frozen = "green"
    for _ in range(60):
        env.step([0.0, 0.0, 1.0])
    assert ob.route_s > i_l + 5.0


def test_host_npcs_advance_and_follow():
    env = SimDrivingEnv(seed=11, vehicle_num=(6, 0), seq_length=1)
    env.reset()
    s0 = np.asarray([ob.route_s for ob in env._obstacles
                     if ob.route_s >= 0])
    for _ in range(100):
        env.step([0.0, 0.0, 1.0])
    s1 = np.asarray([ob.route_s for ob in env._obstacles
                     if ob.route_s >= 0])
    adv = s1 - s0
    assert (adv >= 10.0).mean() >= 0.5, adv
    # car-following: no two route vehicles closer than 1.5 m of arc
    s_sorted = np.sort(s1)
    assert (np.diff(s_sorted) > 1.5).all(), s_sorted
