"""Device-resident JaxDrivingEnv: parity vs the host SimDrivingEnv and
scan-composability (cadre_tpu/envs/jax_env.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadre_tpu.envs.jax_env import (
    JaxDrivingEnv,
    JaxEnvConfig,
    RouteBank,
    _step_one,
    make_route_bank,
)


def _bank_from_sim(sim) -> RouteBank:
    """Single-route bank holding exactly the host env's dense route."""
    dense = sim._route_xy.astype(np.float32)
    n = len(dense)
    routes = np.zeros((1, n + 80, 2), np.float32)
    routes[0, :n] = dense
    routes[0, n:] = dense[-1]
    seg = np.hypot(*(np.diff(dense, axis=0).T))
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    cum /= cum[-1]
    cums = np.ones((1, n + 80), np.float32)
    cums[0, :n] = cum
    props = np.full((1, 40, 6), 1e8, np.float32)
    sim_props = getattr(sim, "_props", np.zeros((0, 6), np.float32))
    props[0, :len(sim_props)] = sim_props      # pixel parity incl. scenery
    return RouteBank(jnp.asarray(routes), jnp.asarray([n], np.int32),
                     jnp.asarray(cums),
                     jnp.asarray(np.full((1, 8, 5), 1e8, np.float32)),
                     jnp.asarray(np.full((1, 2, 5), 1e8, np.float32)),
                     jnp.asarray(props))


def test_bank_from_nocrash_routes_file():
    """The reference NoCrash route XMLs feed the device env's bank."""
    from cadre_tpu.utils.config import Config

    cfg = Config.fromfile("config_files/nocrash_reference_config.py")
    bank = make_route_bank(4, routes_file=cfg["env_cfg"]["routes"][0])
    assert bank.routes.shape[0] >= 1
    assert int(bank.route_len.min()) > 10
    # normalized arc length is monotone and hits 1 at the route end
    for k in range(bank.routes.shape[0]):
        n = int(bank.route_len[k])
        cum = np.asarray(bank.route_cum[k, :n])
        assert cum[0] == 0.0 and abs(cum[-1] - 1.0) < 1e-5
        assert (np.diff(cum) >= 0).all()


def test_bank_and_reset_shapes():
    bank = make_route_bank(3, seed=1)
    assert bank.routes.shape[0] == 3
    assert bank.route_cum.shape == bank.routes.shape[:2]
    env = JaxDrivingEnv(bank, num_envs=2,
                        config=JaxEnvConfig(render=False))
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["rgb"].shape == (2, 144, 256, 3)
    assert obs["route_fig"].shape == (2, 256, 144)
    assert obs["measurements"].shape == (2, 3)
    assert state.pos.shape == (2, 2)
    # measurements start at rest on the route
    np.testing.assert_allclose(np.asarray(obs["measurements"][:, 0]), 0.0)


@pytest.mark.slow
def test_parity_vs_sim_env_full_route():
    """Expert-driven full route: per-step measurements and decomposed
    rewards must track the host env to ~1e-3, the turn-grace flag must
    agree, and both must terminate on the same step with 'success'."""
    from cadre_tpu.envs.expert import OracleExpert
    from cadre_tpu.envs.sim_env import SimDrivingEnv

    sim = SimDrivingEnv(seed=0, vehicle_num=(0, 0),
                        with_traffic_lights=False, weather="ClearNoon",
                        seq_length=1)
    tick = sim.reset()
    bank = _bank_from_sim(sim)
    cfg = JaxEnvConfig(n_vehicles=0, n_walkers=0, randomize_weather=False,
                       render=False)
    env = JaxDrivingEnv(bank, num_envs=1, config=cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    expert = OracleExpert()
    turn_sim = turn_jax = 0
    for t in range(1200):
        a = expert.act(sim, tick)
        tick, rew, done, info = sim.step(a)
        state, out = env.step(state, jnp.asarray([np.asarray(a, np.float32)]))
        turn_sim += int(sim._turn_state.in_turn)
        turn_jax += int(state.turn[0, 7] >= 0.5)
        jdone = bool(out.done[0])
        if done or jdone:
            assert done and jdone, (t, info, int(out.error_code[0]))
            assert info["error_message"] == "success"
            assert int(out.error_code[0]) == 6
            assert float(out.completion[0]) == 1.0
            np.testing.assert_allclose(np.asarray(out.rewards[0]), rew,
                                       atol=1e-3)
            break
        np.testing.assert_allclose(
            np.asarray(out.measurements[0]),
            np.asarray(tick["last_measurements"]), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out.rewards[0]), rew,
                                   atol=2e-3)
    else:
        pytest.fail("route never completed")
    assert turn_sim == turn_jax


@pytest.mark.slow
def test_render_parity_vs_sim_env():
    """Route-figure IoU and camera mean-abs-diff against the host
    renderers at matched states."""
    from cadre_tpu.envs.expert import OracleExpert
    from cadre_tpu.envs.sim_env import SimDrivingEnv

    sim = SimDrivingEnv(seed=0, vehicle_num=(0, 0),
                        with_traffic_lights=False, weather="ClearNoon",
                        seq_length=1)
    tick = sim.reset()
    bank = _bank_from_sim(sim)
    cfg = JaxEnvConfig(n_vehicles=0, n_walkers=0, randomize_weather=False)
    env = JaxDrivingEnv(bank, num_envs=1, config=cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    expert = OracleExpert()
    for t in range(90):
        a = expert.act(sim, tick)
        tick, _, done, _ = sim.step(a)
        state, out = env.step(state, jnp.asarray([np.asarray(a, np.float32)]))
        if t % 30 == 0:
            hf = np.asarray(tick["last_route_fig"]) > 127
            jf = np.asarray(out.route_fig[0]) > 127
            iou = (hf & jf).sum() / max((hf | jf).sum(), 1)
            assert iou > 0.9, (t, iou)
            rgb_diff = np.abs(np.asarray(tick["last_rgb"], np.float32)
                              - np.asarray(out.rgb[0])).mean()
            assert rgb_diff < 8.0, (t, rgb_diff)
        if done:
            break


def test_scan_composability_and_overspeed():
    """A whole batched rollout in ONE lax.scan; constant full throttle must
    terminate with 'exceed speed' (code 7) and auto-reset."""
    bank = make_route_bank(4, seed=2)
    cfg = JaxEnvConfig(n_vehicles=0, n_walkers=0, render=False)
    env = JaxDrivingEnv(bank, num_envs=2, config=cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))

    def body(st, _):
        controls = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (2, 1))
        st, out = jax.vmap(lambda s, c: _step_one(cfg, bank, s, c))(
            st, controls)
        return st, (out.done, out.error_code, out.measurements)

    state2, (done, err, meas) = jax.jit(
        lambda st: jax.lax.scan(body, st, None, length=80))(state)
    done = np.asarray(done)
    assert done.any()
    first = np.argwhere(done)[0]
    assert int(np.asarray(err)[first[0], first[1]]) == 7
    # auto-reset: the done step's obs already belongs to the fresh episode,
    # so speed snaps back near zero from the >9 m/s overspeed
    speeds = np.asarray(meas)[:, :, 0] * 9.0
    t, n = first
    assert speeds[t - 1, n] > 8.0
    assert speeds[t, n] < 1.0


def test_collision_and_blocked_codes():
    bank = make_route_bank(2, seed=4)
    cfg = JaxEnvConfig(n_vehicles=0, n_walkers=0, render=False,
                       max_block_steps=15)
    env = JaxDrivingEnv(bank, num_envs=1, config=cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    # inject a vehicle obstacle 3 m directly ahead
    fwd = np.array([np.cos(np.deg2rad(float(state.yaw[0]))),
                    np.sin(np.deg2rad(float(state.yaw[0])))])
    ob = np.array(state.obstacles)            # [N=1, M=1, 6]
    ob[0, 0, 0] = np.asarray(state.pos[0])[0] + 3 * fwd[0]
    ob[0, 0, 1] = np.asarray(state.pos[0])[1] + 3 * fwd[1]
    ob[0, 0, 2:] = [1.2, 0.0, 0.0, 0.0]
    state = state._replace(obstacles=jnp.asarray(ob))
    controls = jnp.asarray([[0.0, 1.0, 0.0]])
    seen = 0
    for _ in range(25):
        state, out = env.step(state, controls)
        if bool(out.done[0]):
            assert int(out.error_code[0]) == 2   # collision vehicles!
            seen = 1
            break
    assert seen

    # blocked: no throttle from a standstill, tiny block budget
    state, _ = env.reset(jax.random.PRNGKey(3))
    controls = jnp.asarray([[0.0, 0.0, 0.0]])
    for _ in range(25):
        state, out = env.step(state, controls)
        if bool(out.done[0]):
            assert int(out.error_code[0]) == 4   # vehicle blocked
            break
    else:
        pytest.fail("blocked timeout never fired")


def test_route_timeout_code():
    """Route-length-scaled episode timeout (0.8 s/m + 5 s, the
    criteria.py::RouteTimeoutCriterion twin): a creeping policy that never
    blocks and never completes still ends, with code 8 and no reward hit."""
    bank = make_route_bank(1, seed=5, route_legs=1,
                           route_leg_len=(10.0, 12.0))
    cfg = JaxEnvConfig(n_vehicles=0, n_walkers=0, render=False,
                       max_block_steps=100000)
    env = JaxDrivingEnv(bank, num_envs=1, config=cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    controls = jnp.asarray([[0.0, 0.0, 0.0]])
    rlen = float(bank.route_len[0])
    expect = int((0.8 * rlen + 5.0) / cfg.dt)
    for t in range(1, expect + 5):
        state, out = env.step(state, controls)
        if bool(out.done[0]):
            assert int(out.error_code[0]) == 8    # route timeout
            assert t >= expect - 1                # not early
            # no event penalty: the steer reward keeps its shaping value
            assert float(out.rewards[0, 0]) >= 0.0
            break
    else:
        pytest.fail("route timeout never fired")

    # route_timeout=False restores the old unbounded-episode behavior
    cfg2 = JaxEnvConfig(n_vehicles=0, n_walkers=0, render=False,
                        max_block_steps=100000, route_timeout=False)
    env2 = JaxDrivingEnv(bank, num_envs=1, config=cfg2)
    state, _ = env2.reset(jax.random.PRNGKey(0))
    for _ in range(expect + 5):
        state, out = env2.step(state, controls)
        assert not bool(out.done[0])


def test_crossing_hazards_arm_and_spring():
    """Scenario-3 analog (DynamicObjectCrossing): hazards spawn beside the
    route at hazard_offset, stay frozen until the ego closes within
    hazard_trigger, then walk straight across at their latent speed."""
    bank = make_route_bank(2, seed=7)
    cfg = JaxEnvConfig(n_vehicles=0, n_walkers=0, n_hazards=3, render=False)
    env = JaxDrivingEnv(bank, num_envs=1, config=cfg)
    state, _ = env.reset(jax.random.PRNGKey(1))

    ob = np.array(state.obstacles)[0]          # [M=3, 6]
    hz = np.array(state.hazard_speed)[0]
    assert ob.shape == (3, 6)
    assert (ob[:, 4] == 0.0).all()             # armed: frozen
    assert ((hz >= 1.2) & (hz <= 2.0)).all()   # latent crossing speed
    assert (ob[:, 3] == 1.0).all()             # walkers
    # spawned ~hazard_offset m off the route
    route = np.array(bank.routes)[int(state.route_id[0])]
    rlen = int(bank.route_len[int(state.route_id[0])])
    for x, y in ob[:, :2]:
        d = np.hypot(route[:rlen, 0] - x, route[:rlen, 1] - y).min()
        assert 3.0 < d < cfg.hazard_offset + 1.0

    # far away: a step leaves every hazard frozen
    controls = jnp.asarray([[0.0, 0.0, 0.0]])
    state2, _ = env.step(state, controls)
    assert (np.array(state2.obstacles)[0][:, 4] == 0.0).all()

    # bring hazard 0 within trigger range of the (stationary, on-route)
    # ego: it springs and walks straight at its latent speed; the far
    # hazards stay armed
    ego = np.array(state.pos)[0]
    ob_mod = ob.copy()
    ob_mod[0, :2] = ego + np.asarray([5.0, 0.0])
    state_n = state._replace(obstacles=jnp.asarray(ob_mod)[None])
    state3, out3 = env.step(state_n, controls)
    assert not bool(out3.done[0])
    ob3 = np.array(state3.obstacles)[0]
    assert ob3[0, 4] == pytest.approx(hz[0], abs=1e-6)
    assert (ob3[1:, 4] == 0.0).all()
    # sprung hazard keeps moving on the next tick
    state4, out4 = env.step(state3, controls)
    assert not bool(out4.done[0])
    ob4 = np.array(state4.obstacles)[0]
    moved = np.hypot(*(ob4[0, :2] - ob3[0, :2]))
    assert moved == pytest.approx(hz[0] * cfg.dt, rel=1e-3)


def test_outside_route_lanes_parity():
    """Steering hard off the road must end BOTH envs with the
    OutsideRouteLanes termination ('outside route!', code 9) on the same
    step (atomic_criteria.py:1034+ geometry; env_wrapper.py:421-425
    reward handling). Exercises the round-4 device-env analog."""
    from cadre_tpu.envs.sim_env import SimDrivingEnv

    sim = SimDrivingEnv(seed=1, vehicle_num=(0, 0),
                        with_traffic_lights=False, weather="ClearNoon",
                        seq_length=1)
    tick = sim.reset()
    bank = _bank_from_sim(sim)
    cfg = JaxEnvConfig(n_vehicles=0, n_walkers=0, randomize_weather=False,
                       render=False)
    env = JaxDrivingEnv(bank, num_envs=1, config=cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    t_host = t_dev = None
    for t in range(300):
        a = [0.0, 0.6, 0.0] if t < 30 else [-0.9, 0.4, 0.0]
        if t_host is None:
            tick, _, done, info = sim.step(a)
            if done:
                assert info["error_message"] == "outside route!"
                t_host = t
        if t_dev is None:
            state, out = env.step(state,
                                  jnp.asarray([np.asarray(a, np.float32)]))
            if bool(out.done[0]):
                assert int(out.error_code[0]) == 9
                t_dev = t
        if t_host is not None and t_dev is not None:
            break
    assert t_host is not None and t_dev is not None
    assert abs(t_host - t_dev) <= 1, (t_host, t_dev)


def test_signed_route_lateral_envelope():
    """Unit check of the two-lane road envelope: left boundary at
    1.5*lane+1.3 (past the oncoming lane), right at 0.5*lane+1.3."""
    from cadre_tpu.envs.route_fig import (
        OUT_LEFT,
        OUT_RIGHT,
        outside_route_lanes,
        signed_route_lateral,
    )

    route = np.stack([np.arange(50, dtype=np.float64),
                      np.zeros(50)], axis=-1)
    # +y is LEFT of travel (+x direction)
    assert signed_route_lateral(route, (10.0, 2.0)) == pytest.approx(2.0)
    assert signed_route_lateral(route, (10.0, -2.0)) == pytest.approx(-2.0)
    assert not outside_route_lanes(OUT_LEFT - 0.01)
    assert outside_route_lanes(OUT_LEFT + 0.01)
    assert not outside_route_lanes(-(OUT_RIGHT - 0.01))
    assert outside_route_lanes(-(OUT_RIGHT + 0.01))


def test_theta_endgame_supplementary_angle():
    """Two-waypoint endgame: the device theta must match the host
    heading_error incl. the supplementary-angle flip (route_fig.py:149-153)
    and the perpendicular-distance swap for `dis`."""
    from cadre_tpu.envs.jax_env import _scalars
    from cadre_tpu.envs.route_fig import TurnState, heading_error
    from cadre_tpu.envs.route_fig import perpendicular_distance

    # straight +x route; ego PAST the final nodes, heading +x: vector2
    # points backwards -> host flips theta to pi - theta when rotated y>0
    n = 60
    route = np.zeros((n + 80, 2), np.float32)
    route[:n, 0] = np.arange(n)
    route[n:] = route[n - 1]
    seg = np.hypot(*(np.diff(route[:n], axis=0).T))
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    cum /= cum[-1]
    cums = np.ones(n + 80, np.float32)
    cums[:n] = cum
    bank = RouteBank(jnp.asarray(route)[None],
                     jnp.asarray([n], np.int32),
                     jnp.asarray(cums)[None],
                     jnp.asarray(np.full((1, 8, 5), 1e8, np.float32)),
                     jnp.asarray(np.full((1, 2, 5), 1e8, np.float32)),
                     jnp.asarray(np.full((1, 40, 6), 1e8, np.float32)))
    cfg = JaxEnvConfig(n_vehicles=0, n_walkers=0, render=False)
    env = JaxDrivingEnv(bank, num_envs=1, config=cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    # place the ego so only nodes {n-2, n-1} remain in the window, offset
    # 1.2 m laterally, heading +x (yaw 0)
    pos = np.asarray([n - 1.5, 1.2], np.float32)
    state = state._replace(pos=jnp.asarray(pos)[None],
                           yaw=jnp.zeros_like(state.yaw),
                           head=jnp.full_like(state.head, n - 2))
    scal = jax.vmap(lambda s: _scalars(cfg, bank, s))(state)
    route_list = [route[n - 2], route[n - 1]]
    ts = TurnState()
    theta_h, _ = heading_error(route[n - 1], route[n - 2], pos,
                               np.asarray([1.0, 0.0]), 2, ts, 0.0)
    pep_h = perpendicular_distance(route_list, pos)
    assert float(scal["theta"][0]) == pytest.approx(theta_h, abs=1e-5)
    assert float(scal["dis"][0]) == pytest.approx(pep_h, abs=1e-5)


def test_reset_routes_pins_sequential_eval_routes():
    """reset_routes pins env i to route_ids[i] — the sequential
    RouteIndexer eval semantics (route_indexer.py:6-41) used by the
    NoCrash protocol driver."""
    bank = make_route_bank(4, seed=5)
    env = JaxDrivingEnv(bank, num_envs=4,
                        config=JaxEnvConfig(training=False, render=False,
                                            n_vehicles=0, n_walkers=0))
    ids = np.asarray([3, 1, 0, 2])
    state, obs = env.reset_routes(jax.random.PRNGKey(0), ids)
    assert (np.asarray(state.route_id) == ids).all()
    # each env starts at ITS route's first waypoint
    starts = np.asarray(bank.routes)[ids, 0]
    np.testing.assert_allclose(np.asarray(state.pos), starts, atol=1e-4)


def test_junction_crossers_arm_and_spring():
    """Scenario-4 analog (VehicleTurningRoute /
    object_crash_intersection.py:689): cyclist-class crossers spawn
    beside the route's signalized junctions (the corner lights), stay
    frozen until approach, then drive straight across at their latent
    speed; collisions class as VEHICLE (the cyclist blueprint)."""
    bank = make_route_bank(2, seed=7)
    cfg = JaxEnvConfig(n_vehicles=0, n_walkers=0, n_junction_hazards=2,
                       render=False)
    env = JaxDrivingEnv(bank, num_envs=1, config=cfg)
    state, _ = env.reset(jax.random.PRNGKey(2))

    ob = np.array(state.obstacles)[0]          # [M=2, 6]
    hz = np.array(state.hazard_speed)[0]
    rid = int(state.route_id[0])
    lights = np.array(bank.lights)[rid]
    live = lights[lights[:, 0] < 1e6]
    assert len(live) > 0, "route has no corner lights to anchor crossers"
    assert (ob[:, 4] == 0.0).all()             # armed: frozen
    assert ((hz >= cfg.junction_hazard_speed[0])
            & (hz <= cfg.junction_hazard_speed[1])).all()
    assert (ob[:, 3] == 0.0).all()             # VEHICLE collision class
    np.testing.assert_allclose(ob[:, 2], 0.6)       # cyclist footprint
    # anchored hazard_offset m from a junction light center
    for x, y in ob[:, :2]:
        d = np.hypot(live[:, 0] - x, live[:, 1] - y).min()
        assert d == pytest.approx(cfg.hazard_offset, abs=0.5)

    # bring crosser 0 within trigger range: it springs at its latent
    # speed and drives straight on following ticks
    controls = jnp.asarray([[0.0, 0.0, 0.0]])
    ego = np.array(state.pos)[0]
    ob_mod = ob.copy()
    ob_mod[0, :2] = ego + np.asarray([5.0, 0.0])
    state_n = state._replace(obstacles=jnp.asarray(ob_mod)[None])
    state2, _ = env.step(state_n, controls)
    ob2 = np.array(state2.obstacles)[0]
    assert ob2[0, 4] == pytest.approx(hz[0], abs=1e-6)
    assert (ob2[1:, 4] == 0.0).all()
    state3, _ = env.step(state2, controls)
    ob3 = np.array(state3.obstacles)[0]
    moved = np.hypot(*(ob3[0, :2] - ob2[0, :2]))
    assert moved == pytest.approx(hz[0] * cfg.dt, rel=1e-3)

    # a collision with a sprung crosser terminates as a VEHICLE collision
    ob_hit = ob.copy()
    ob_hit[0, :2] = ego + np.asarray([0.5, 0.0])
    ob_hit[0, 4] = hz[0]
    state_h = state._replace(obstacles=jnp.asarray(ob_hit)[None])
    # the first post-reset step carries the begin grace; the collision
    # terminates on the next tick
    state_h, out_h = env.step(state_h, controls)
    if not bool(out_h.done[0]):
        ob_again = np.array(state_h.obstacles)[0]
        ob_again[0, :2] = np.array(state_h.pos)[0] + np.asarray([0.5, 0.0])
        state_h = state_h._replace(obstacles=jnp.asarray(ob_again)[None])
        state_h, out_h = env.step(state_h, controls)
    assert bool(out_h.done[0])
    from cadre_tpu.envs.jax_env import ERROR_CODES
    assert ERROR_CODES[int(out_h.error_code[0])] == "collision vehicles!"
