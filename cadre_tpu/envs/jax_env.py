"""Device-resident batched driving environment (pure JAX).

TPU-first counterpart of `SimDrivingEnv`: the WHOLE environment — bicycle
dynamics, the GPS route-planner window, the route-figure raster, the
synthetic forward camera, the decomposed steer/throttle reward, and episode
termination with auto-reset — is a pure function over a `JaxEnvState`
pytree, batched over N envs and scanned over T steps ON DEVICE. This removes
the host from the rollout hot path entirely: the 10 Hz sim-lock the
reference never solved (SURVEY §7 "hard parts"; the reference's workers are
serialized on CARLA's `world.tick`, env_wrapper.py:857-918) becomes one
`lax.scan` per training iteration, so PPO env-steps/s is bounded by TPU
compute, not host IPC.

Behavioral contract (same as SimDrivingEnv, cited to the reference):
  - dynamics: sim_env.py control mapping (steer -> <=35deg wheel on a 2.9 m
    wheelbase, throttle ~3.5 m/s^2, brake ~8 m/s^2, 0.08/s drag) at 10 Hz.
  - planner: leaderboard/team_code/planner.py:312-355 pop-within-4m /
    50 m-window semantics (including the `argmax(dist * in_range)` pop
    quirk), over 1 m-dense routes.
  - route figure: env_wrapper.py:240-344 — width-15 ribbon on a 256x144
    ego-frame canvas rotated by compass+pi/2 at 3.66 px/m.
  - reward/termination: env_wrapper.py:361-482 via the same math as
    cadre_tpu/envs/reward.py (theta grace in turns, obstacle-aware speed
    shaping, D_max widening, block timeout, overspeed, event table),
    including the OutsideRouteLanes analog (route_fig.signed_route_lateral
    envelope -> steer -1 + done, env_wrapper.py:421-425) and the
    two-waypoint supplementary-angle theta / perpendicular-dis endgame
    (route_fig.py heading_error / draw_route).
  - camera: SimDrivingEnv._render_rgb — sky/ground split, projected route
    markers, obstacle blobs, traffic-light heads with the forced
    green/yellow/red cycle (atomic_criteria.py:1869-1871), weather
    brightness/noise presets.

Documented divergences from the host env (all small, none touching the
reward table):
  - red-light and stop-sign infractions run IN-GRAPH (vectorized ports of
    RunningRedLightCriterion / RunningStopCriterion,
    atomic_criteria.py:1836-2075 / :2076+ via envs/traffic_lights.py) and
    accumulate per-episode counts in state; like the host, they affect the
    driving score only, never the training reward/termination.
  - adversarial scenario behaviors (ScenarioManager) stay host-side; the
    device env covers background vehicles/walkers (walkers wander exactly as
    in SimDrivingEnv._world_step) plus in-graph Scenario-3 AND Scenario-4
    analogs: `JaxEnvConfig.n_hazards` crossing pedestrians armed beside the
    route (srunner DynamicObjectCrossing, object_crash_vehicle.py:1-200)
    and `n_junction_hazards` cyclist-class crossers armed at the
    signalized junctions (VehicleTurningRoute,
    object_crash_intersection.py:689), both springing when the ego closes
    within `hazard_trigger` m.
  - VEHICLE_BLOCKED comes from the reward-path 400-step timeout only (it
    fires at 40 s, long before the 180 s criteria test would).
  - rgb route markers come from a 64-waypoint window ahead of the planner
    head (the full-route pass would be visible only behind the ego).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cadre_tpu.ops import paint
from cadre_tpu.envs.route_fig import (
    LINE_WIDTH,
    OUT_LEFT as _OUT_LEFT,
    OUT_RIGHT as _OUT_RIGHT,
    PIXELS_PER_METER,
    SIZE_X,
    SIZE_Y,
)
from cadre_tpu.envs.sim_env import (
    WEATHER_PRESETS,
    roadside_props,
    synthetic_route,
)
from cadre_tpu.envs.traffic_lights import (
    CYCLE,
    GREEN_TIME,
    YELLOW_TIME,
    lights_at_route_corners,
)

# ---------------------------------------------------------------- constants

_H, _W = SIZE_X, SIZE_Y            # camera 144 x 256
_FH, _FW = SIZE_Y, SIZE_X          # route figure 256 x 144
_FOCAL = 128.0                     # 90-degree fov at 256 wide
_CAM_H = 1.3
_EGO_RADIUS = 1.2
_MAX_WHEEL = math.radians(35.0)
_WHEELBASE = 2.9

_VEH_EXTENT = 2.45                 # lincoln.mkz2017 extent.x (criteria)
_LANE_WIDTH = 3.5

_WNAMES = list(WEATHER_PRESETS)
_SKY = np.asarray([WEATHER_PRESETS[n][0] for n in _WNAMES], np.float32)
_BRIGHT = np.asarray([WEATHER_PRESETS[n][1] for n in _WNAMES], np.float32)
_NOISE = np.asarray([WEATHER_PRESETS[n][2] for n in _WNAMES], np.float32)

_LIGHT_COLORS = np.asarray(
    [[40.0, 255.0, 60.0],          # green
     [255.0, 220.0, 40.0],         # yellow
     [255.0, 30.0, 30.0]],         # red
    np.float32)

_FAR = 1.0e8                       # padding sentinel for light positions


# ---------------------------------------------------------------- config

@dataclasses.dataclass(frozen=True)
class JaxEnvConfig:
    """Static (compile-time) environment configuration."""

    dt: float = 0.1
    training: bool = True
    max_block_steps: int = 400
    # route-length-scaled episode timeout (route_scenario.py:271-283; host
    # twin criteria.py::RouteTimeoutCriterion, 0.8 s/m + 5 s). Without it a
    # policy can creep inside the route corridor forever, never completing
    # and never blocking (speed >= 1) — observed as episodes_done -> 0 in
    # long device-scale runs.
    route_timeout: bool = True
    window: int = 52               # planner lookahead entries (1 m dense)
    rgb_window: int = 64           # camera route-marker lookahead entries
    n_vehicles: int = 6
    # background vehicles DRIVE the route (CARLA traffic-manager autopilot,
    # route_scenario.py:473-495): cruise-speed range, car-following gap, and
    # accel limit of the kinematic follower. Parked-forever NPCs were the
    # diagnosed 35%-completion floor — the ego reward-farms behind a car
    # that never moves until route timeout (reward.py obstacle shaping +
    # detect-refreshed block timer, both faithful to env_wrapper.py:443-476).
    npc_cruise: Tuple[float, float] = (3.0, 6.5)
    npc_gap: float = 8.0
    npc_accel: float = 3.0
    n_walkers: int = 6
    min_speed: float = 5.0
    max_speed: float = 9.0
    target_speed: float = 7.0
    max_degree: float = 90.0
    d_max_straight: float = 2.5
    d_max_turn: float = 5.0
    d_max_eval: float = 10.0
    max_offroad: float = 30.0      # InRoute deviation threshold
    randomize_weather: bool = True
    render: bool = True            # False: skip rgb/fig (env-core studies)
    # camera-route protocol (scripts/cascade_proof.py BlindRouteSim twin):
    # zero the privileged (dis, theta) measurements in the POLICY obs so
    # route geometry is only reachable through the camera -> encoder path;
    # reward/termination still use the true values internally
    blind_route: bool = False
    # Scenario-3-style crossing hazards (srunner DynamicObjectCrossing,
    # object_crash_vehicle.py): pedestrians armed at lateral offsets along
    # the route that spring into a straight crossing walk when the ego
    # closes within `hazard_trigger` meters. 0 = off (default; matches the
    # host SimDrivingEnv, whose adversaries come from ScenarioManager).
    n_hazards: int = 0
    hazard_trigger: float = 12.0   # spring distance (m)
    hazard_offset: float = 5.0     # lateral spawn offset from the route (m)
    # Scenario-4-style junction crossers (srunner VehicleTurningRoute /
    # object_crash_intersection.py): CYCLIST-class adversaries (vehicle
    # collision class, the reference's vehicle.diamondback.century
    # blueprint) armed beside a signalized junction (the route's corner
    # lights), springing into a straight crossing drive on approach.
    n_junction_hazards: int = 0
    junction_hazard_speed: Tuple[float, float] = (2.5, 4.0)
    # in-graph priority route curriculum (PriorityRouteIndexer,
    # leaderboard/utils/priority_route_indexer.py:42-61): each env keeps a
    # per-route priority table (init 100; on episode end priority[route] =
    # 100 - completion%), and reset samples eps=0.2 uniform else
    # softmax(priority) — jax.random.categorical(logits=priority) IS that
    # softmax draw. Per-ENV tables mirror the reference's per-WORKER
    # indexers. Off by default (uniform sampling, the protocol every
    # landed artifact used).
    priority_routes: bool = False


class RouteBank(NamedTuple):
    """Device-resident episode bank: K padded routes + their lights/signs."""

    routes: jnp.ndarray            # [K, R, 2] f32, padded with the endpoint
    route_len: jnp.ndarray         # [K] i32
    route_cum: jnp.ndarray         # [K, R] f32 normalized arc length 0..1
    lights: jnp.ndarray            # [K, L, 5] f32 (x, y, phase, dir_x,
    #                                dir_y); x=_FAR pad
    stop_signs: jnp.ndarray        # [K, S, 5] f32 (x, y, ext_x, ext_y,
    #                                yaw_deg); x=_FAR pad
    props: jnp.ndarray             # [K, P, 6] f32 roadside scenery
    #                                (x, y, half_w, height, kind, shade);
    #                                x=_FAR pad (sim_env.roadside_props)


class JaxEnvState(NamedTuple):
    """Per-env episode state (add a leading batch axis via vmap)."""

    route_id: jnp.ndarray          # i32
    head: jnp.ndarray              # i32 planner head index
    progress: jnp.ndarray          # i32 RouteCompletion farthest-index
    pos: jnp.ndarray               # [2] f32
    yaw: jnp.ndarray               # f32 degrees
    speed: jnp.ndarray             # f32 m/s
    step: jnp.ndarray              # i32 steps since reset
    last_event_t: jnp.ndarray      # i32 (block-timeout bookkeeping)
    begin: jnp.ndarray             # i32 1 on the first post-reset step
    obstacles: jnp.ndarray         # [M, 6] x, y, radius, kind, speed, heading
    hazard_speed: jnp.ndarray      # [M] f32 latent crossing speed of an
    #                                armed scenario hazard (0 = not a hazard)
    npc_s: jnp.ndarray             # [M] f32 route arc position (m) of a
    #                                route-driving vehicle; -1 = not bound
    npc_cruise: jnp.ndarray        # [M] f32 cruise speed of a route vehicle
    weather: jnp.ndarray           # i32 preset index
    turn: jnp.ndarray              # [8] TurnState: first_xy, last_xy,
    #                                first_dir, has_first, has_last, in_turn
    last_red: jnp.ndarray          # i32 debounced red-light index (-1 none)
    stop_state: jnp.ndarray        # [3] f32: target sign idx (-1 none),
    #                                stop_completed, affected
    infractions: jnp.ndarray       # [2] i32 episode counts (red, stop)
    route_prio: jnp.ndarray        # [K] f32 per-route curriculum priority
    #                                (100 - completion%; priority indexer)
    rng: jnp.ndarray               # per-env PRNG key


class StepOutput(NamedTuple):
    rgb: jnp.ndarray               # [144, 256, 3] f32 0..255
    route_fig: jnp.ndarray         # [256, 144] f32 {0, 255}
    measurements: jnp.ndarray      # [3] f32 (speed/max, dis/3, |deg|/90)
    command: jnp.ndarray           # i32 (always 3 = LANEFOLLOW)
    rewards: jnp.ndarray           # [2] f32 (steer, throttle)
    done: jnp.ndarray              # bool
    action_done: jnp.ndarray       # [2] i32 (steer_done, throttle_done)
    completion: jnp.ndarray        # f32 route-completion ratio (at `done`)
    error_code: jnp.ndarray        # i32, see ERROR_CODES
    infractions: jnp.ndarray       # [2] i32 episode (red, stop) counts so
    #                                far; read at `done` for scoring


ERROR_CODES = {
    0: "", 1: "collision static", 2: "collision vehicles!",
    3: "collision pedestrians!", 4: "vehicle blocked", 5: "route deviation",
    6: "success", 7: "exceed speed", 8: "route timeout",
    9: "outside route!",
}


# ---------------------------------------------------------------- bank

def make_route_bank(n_routes: int, seed: int = 0, route_legs: int = 3,
                    route_leg_len: Tuple[float, float] = (40.0, 90.0),
                    max_lights: int = 8, pad: int = 80,
                    routes_file: Optional[str] = None,
                    max_stop_signs: int = 2,
                    stop_sign_prob: float = 0.0,
                    max_props: int = 40,
                    with_props: bool = True,
                    map_name: Optional[str] = None,
                    dense_routes: Optional[Sequence[np.ndarray]] = None
                    ) -> RouteBank:
    """Host-side episode-bank builder (same synthetic-route generator and
    corner-light synthesizer as SimDrivingEnv._world_reset).

    With `routes_file`, the bank holds the route XML's trajectories (e.g.
    the reference NoCrash routes) instead of synthetic ones; `n_routes`
    caps how many are taken. With `map_name` too, the XML keypoints are
    traced over the approximate town road grid (envs/town_maps.py) so the
    dense routes turn at the town's junctions — the interpolate_trajectory
    analog (route_manipulation.py:132-169) — instead of straight-line
    interpolation. `dense_routes` bypasses route generation entirely with
    pre-traced [N,2] polylines. `stop_sign_prob` > 0 converts that
    fraction of corner lights into stop signs (trigger bbox straddling
    the stop line, RunningStopTest geometry) instead."""
    from cadre_tpu.envs.route_parser import interpolate_route

    rng = np.random.RandomState(seed)
    pre_traced = dense_routes is not None
    keypoints = []
    if pre_traced:
        keypoints = [np.asarray(d, np.float64)
                     for d in dense_routes[:n_routes]]
    elif routes_file is not None:
        from cadre_tpu.envs.route_parser import parse_routes_file

        for cfg in parse_routes_file(routes_file)[:n_routes]:
            keypoints.append(np.asarray([w.xy for w in cfg.trajectory]))
        if not keypoints:
            raise ValueError(f"no routes in {routes_file}")
        if map_name is not None:
            from cadre_tpu.envs.town_maps import (
                town_map,
                trace_dense_route,
            )

            tmap = town_map(map_name)
            keypoints = [trace_dense_route(tmap, kp) for kp in keypoints]
            pre_traced = True
    else:
        keypoints = [synthetic_route(rng, n_legs=route_legs,
                                     leg_len=route_leg_len)
                     for _ in range(n_routes)]
    n_routes = len(keypoints)

    dense_list, lights_list, signs_list, props_list = [], [], [], []
    for pts in keypoints:
        dense = interpolate_route(pts, resolution=1.0)
        dense_list.append(dense)
        if pre_traced:
            # corner-light synthesis needs LEG keypoints, not the dense
            # trace (per-meter heading deltas never clear min_turn_deg):
            # rebuild [start, corners..., end] from the traced polyline
            from cadre_tpu.envs.scenarios import _route_corners

            corners = _route_corners(dense)
            pts = np.concatenate([dense[:1], corners, dense[-1:]]) \
                if len(corners) else np.stack([dense[0], dense[-1]])
        lights = lights_at_route_corners(pts, dense, rng)
        arr = np.full((max_lights, 5), _FAR, np.float32)
        signs = np.full((max_stop_signs, 5), _FAR, np.float32)
        n_li = n_si = 0
        for li in lights:
            sl = li.stop_lines[0]
            if stop_sign_prob > 0 and rng.rand() < stop_sign_prob \
                    and n_si < max_stop_signs:
                # trigger bbox straddling the stop line, long axis along
                # the lane (RunningStopTest trigger volumes are lane-wide
                # boxes a few meters deep)
                yaw = math.degrees(math.atan2(sl.dir[1], sl.dir[0]))
                signs[n_si] = [sl.pos[0], sl.pos[1], 2.0,
                               0.5 * sl.lane_width, yaw]
                n_si += 1
            elif n_li < max_lights:
                arr[n_li] = [li.center[0], li.center[1], li.phase,
                             sl.dir[0], sl.dir[1]]
                n_li += 1
        lights_list.append(arr)
        signs_list.append(signs)
        pr = np.full((max_props, 6), _FAR, np.float32)
        if with_props:
            gen = roadside_props(dense, rng, max_props=max_props)
            pr[:len(gen)] = gen
        props_list.append(pr)
    # pad past the longest route by `pad` endpoint copies so a window
    # dynamic_slice at head <= rlen-2 never has to clip its start
    r_max = max(len(d) for d in dense_list) + pad
    routes = np.zeros((n_routes, r_max, 2), np.float32)
    cums = np.ones((n_routes, r_max), np.float32)
    lens = np.zeros((n_routes,), np.int32)
    for i, d in enumerate(dense_list):
        routes[i, :len(d)] = d
        routes[i, len(d):] = d[-1]
        seg = np.hypot(*(np.diff(d, axis=0).T))
        cum = np.concatenate([[0.0], np.cumsum(seg)])
        cums[i, :len(d)] = cum / max(cum[-1], 1e-6)
        lens[i] = len(d)
    return RouteBank(jnp.asarray(routes), jnp.asarray(lens),
                     jnp.asarray(cums), jnp.asarray(np.stack(lights_list)),
                     jnp.asarray(np.stack(signs_list)),
                     jnp.asarray(np.stack(props_list)))


# ---------------------------------------------------------------- core math

def _heading(yaw_deg):
    yaw = jnp.deg2rad(yaw_deg)
    return jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])


def _route_window(cfg: JaxEnvConfig, bank: RouteBank, state: JaxEnvState,
                  length: int):
    """[length, 2] window at the planner head + per-entry validity mask."""
    route = bank.routes[state.route_id]                    # [R, 2]
    rlen = bank.route_len[state.route_id]
    start = jnp.clip(state.head, 0, route.shape[0] - length)
    w = jax.lax.dynamic_slice(route, (start, 0), (length, 2))
    valid = (start + jnp.arange(length)) < rlen
    return w, valid, rlen


def _plan_pop(cfg: JaxEnvConfig, bank: RouteBank, state: JaxEnvState
              ) -> JaxEnvState:
    """RoutePlanner.run_step pop semantics (planner.py:312-355)."""
    w, valid, rlen = _route_window(cfg, bank, state, cfg.window)
    seg = jnp.linalg.norm(w[1:] - w[:-1], axis=-1)
    seg = jnp.where(valid[1:], seg, 0.0)
    cum = jnp.cumsum(seg)
    n_ahead = jnp.searchsorted(cum, 50.0) + 2              # break-step +1
    idx = jnp.arange(cfg.window - 1) + 1                   # entries 1..W-1
    dist = jnp.linalg.norm(w[1:] - state.pos[None], axis=-1)
    in_range = (dist <= 4.0) & (idx < n_ahead) & valid[1:]
    any_pop = jnp.any(in_range)
    # reference quirk: pops up to the FARTHEST in-range node (+1)
    to_pop = jnp.where(any_pop,
                       jnp.argmax(jnp.where(in_range, dist, -1.0)) + 1, 0)
    head = jnp.minimum(state.head + to_pop, rlen - 2)      # keep >=2 nodes
    return state._replace(head=head.astype(jnp.int32))


def _scalars(cfg: JaxEnvConfig, bank: RouteBank, state: JaxEnvState):
    """Per-step scalar geometry: dis, theta, in_turn, off-route distance,
    completion, plus the raster window (reused by the renderers)."""
    w, valid, rlen = _route_window(cfg, bank, state, cfg.window)
    # route_list truncation at 50 m cumulative (planner.py:341-350)
    seg = jnp.linalg.norm(w[1:] - w[:-1], axis=-1)
    seg = jnp.where(valid[1:], seg, 0.0)
    cum = jnp.cumsum(seg)
    n_list = jnp.searchsorted(cum, 50.0) + 2
    list_mask = (jnp.arange(cfg.window) < n_list) & valid

    # `dis` = Euclidean distance to the near node, zeroed below 0.5 m
    # (route_fig.heading_error / env_wrapper.py:484-561); in the
    # two-waypoint endgame the host swaps in the perpendicular distance to
    # the remaining segment (route_fig.draw_route / env_wrapper.py:287-296)
    p0, p1 = w[0], w[1]
    n_valid = jnp.sum(list_mask)
    endgame = n_valid == 2
    seg01 = p1 - p0
    nseg = jnp.linalg.norm(seg01)
    relp = state.pos - p0
    pep = jnp.abs(seg01[0] * relp[1] - seg01[1] * relp[0]) \
        / jnp.maximum(nseg, 1e-9)
    pep = jnp.where(nseg > 1e-3, pep, 0.0)
    dis = jnp.linalg.norm(p0 - state.pos)
    dis = jnp.where(dis < 0.5, 0.0, dis)
    dis = jnp.where(endgame, pep, dis)

    # heading error (route_fig.heading_error; far node = first distinct),
    # with the two-waypoint supplementary-angle case (route_fig.py:149-153 /
    # env_wrapper.py get_theta): when only 2 nodes remain and the far node
    # sits at positive rotated-y in the ego raster frame, theta -> pi-theta
    fwd = _heading(state.yaw)
    v2 = p1 - state.pos
    n2 = jnp.linalg.norm(v2)
    cosang = jnp.clip(jnp.dot(fwd, v2) / jnp.maximum(n2, 1e-9), -1.0, 1.0)
    theta = jnp.where(n2 > 1e-9, jnp.arccos(cosang), 0.0)
    c = jnp.deg2rad(state.yaw) + jnp.pi / 2
    y4 = -jnp.sin(c) * v2[0] + jnp.cos(c) * v2[1]
    theta = jnp.where(endgame & (y4 > 0), jnp.pi - theta, theta)

    # InRoute: distance to the nearest upcoming waypoint
    d_all = jnp.linalg.norm(w - state.pos[None], axis=-1)
    off_route = jnp.min(jnp.where(valid, d_all, jnp.inf))

    # OutsideRouteLanesTest analog (route_fig.signed_route_lateral /
    # atomic_criteria.py:1034+): signed lateral from the nearest window
    # segment, positive to the LEFT of travel; outside the two-lane road
    # envelope = past OUT_LEFT (6.55) left or OUT_RIGHT (3.05) right
    i_near = jnp.argmin(jnp.where(valid, d_all, jnp.inf))
    i_seg = jnp.minimum(i_near, cfg.window - 2)
    sp0 = w[i_seg]
    sseg = w[i_seg + 1] - sp0
    snrm = jnp.linalg.norm(sseg)
    srel = state.pos - sp0
    lat = (sseg[0] * srel[1] - sseg[1] * srel[0]) / jnp.maximum(snrm, 1e-9)
    seg_ok = valid[i_seg + 1] & (snrm > 1e-6)
    off_lane = seg_ok & ((lat > _OUT_LEFT) | (lat < -_OUT_RIGHT))

    return dict(w=w, list_mask=list_mask, dis=dis, theta=theta,
                off_route=off_route, off_lane=off_lane)


def _update_progress(bank: RouteBank, state: JaxEnvState,
                     terminate_pct: float = 99.0):
    """RouteCompletionCriterion (atomic_criteria.py:1731-1835 via
    criteria.py): advance the farthest dense-route index within 10 m over a
    50-entry lookahead; completion = normalized arc length; ROUTE_COMPLETED
    at >= terminate_pct percent."""
    route = bank.routes[state.route_id]
    rlen = bank.route_len[state.route_id]
    start = state.progress
    w = jax.lax.dynamic_slice(route, (start, 0), (50, 2))
    valid = (start + jnp.arange(50)) < rlen
    d = jnp.linalg.norm(w - state.pos[None], axis=-1)
    close = (d < 10.0) & valid
    last_close = jnp.where(
        jnp.any(close), 49 - jnp.argmax(close[::-1]), 0)
    progress = jnp.minimum(start + last_close, rlen - 1).astype(jnp.int32)
    completion = bank.route_cum[state.route_id, progress]
    completed = completion >= terminate_pct / 100.0
    completion = jnp.where(completed, 1.0, completion)
    return state._replace(progress=progress), completion, completed


def _update_turn(state: JaxEnvState, w, list_mask) -> JaxEnvState:
    """route_fig.update_turn_state (env_wrapper.py:302-343), exact port:
    a scan over the window nodes advancing `turn_pre` on significant
    (|dx|>=1 AND |dy|>=1 cumulative) nodes; first/last corner nodes and the
    in_turn flag persist in state.turn across steps."""
    t = state.turn
    first, last = t[0:2], t[2:4]
    first_dir, has_first, has_last = t[4], t[5], t[6]
    in_turn = t[7]

    def body(carry, x):
        turn_pre, first, last, first_dir, has_first, has_last = carry
        cur, ok = x
        d = jnp.abs(cur - turn_pre)
        sig = ok & (d[0] >= 1.0) & (d[1] >= 1.0)
        direction = (d[0] >= d[1]).astype(jnp.float32)     # 0 iff dx < dy
        take_first = sig & (has_first < 0.5)
        take_last = sig & (has_first >= 0.5)
        first = jnp.where(take_first, cur, first)
        first_dir = jnp.where(take_first, direction, first_dir)
        has_first = jnp.maximum(has_first, take_first.astype(jnp.float32))
        last = jnp.where(take_last, cur, last)
        has_last = jnp.maximum(has_last, take_last.astype(jnp.float32))
        turn_pre = jnp.where(sig, cur, turn_pre)
        return (turn_pre, first, last, first_dir, has_first, has_last), None

    carry = (w[0], first, last, first_dir, has_first, has_last)
    (_, first, last, first_dir, has_first, has_last), _ = jax.lax.scan(
        body, carry, (w, list_mask))

    has_both = (has_first >= 0.5) & (has_last >= 0.5)
    middle = jnp.where(first_dir < 0.5,
                       jnp.stack([last[0], first[1]]),
                       jnp.stack([first[0], last[1]]))
    turn_dis = jnp.linalg.norm(middle - state.pos)
    max_dis = jnp.maximum(jnp.linalg.norm(middle - first),
                          jnp.linalg.norm(middle - last))
    near = turn_dis < max_dis + 6.0
    enter = has_both & near
    leave = has_both & ~near & (in_turn >= 0.5)
    new_in = jnp.where(enter, 1.0, jnp.where(leave, 0.0, in_turn))
    reset = leave
    zero2 = jnp.zeros(2, jnp.float32)
    first = jnp.where(reset, zero2, first)
    last = jnp.where(reset, zero2, last)
    first_dir = jnp.where(reset, 0.0, first_dir)
    has_first = jnp.where(reset, 0.0, has_first)
    has_last = jnp.where(reset, 0.0, has_last)
    turn = jnp.concatenate([first, last,
                            jnp.stack([first_dir, has_first, has_last,
                                       new_in])])
    return state._replace(turn=turn.astype(jnp.float32))


def _nearest_obstacle_ahead(state: JaxEnvState):
    """Forward obstacle distance within the 11 m cone, else -1
    (env_wrapper.py:832-837 / SimDrivingEnv._nearest_obstacle_ahead)."""
    fwd = _heading(state.yaw)
    rel = state.obstacles[:, :2] - state.pos[None]
    dist = jnp.linalg.norm(rel, axis=-1)
    ahead = rel @ fwd
    lateral = jnp.abs(rel[:, 0] * fwd[1] - rel[:, 1] * fwd[0])
    ok = (dist <= 11.0) & (dist > 1e-6) & (ahead > 0.0) & (lateral < 1.5)
    best = jnp.min(jnp.where(ok, dist, jnp.inf))
    return jnp.where(jnp.isfinite(best), best, -1.0)


def _light_phases(cfg: JaxEnvConfig, lights: jnp.ndarray, step) -> jnp.ndarray:
    """[L] i32 phase per light at `step` (0 green, 1 yellow, 2 red) under
    the forced cycle (atomic_criteria.py:1869-1871)."""
    t = step.astype(jnp.float32) * cfg.dt
    u = (t + lights[:, 2]) % CYCLE
    return jnp.where(u < GREEN_TIME, 0,
                     jnp.where(u < GREEN_TIME + YELLOW_TIME, 1, 2))


def _red_light_check(cfg: JaxEnvConfig, bank: RouteBank, state: JaxEnvState
                     ) -> JaxEnvState:
    """Vectorized RunningRedLightCriterion (traffic_lights.py:221-307 ≙
    atomic_criteria.py:1836-2075): if the ego tail segment crosses a red
    light's stop line (centered on the trigger volume) in the ego's
    lane/direction within DISTANCE_LIGHT, count one infraction, debounced
    per light via `last_red` (the reference's `_last_red_light_id`)."""
    lights = bank.lights[state.route_id]                    # [L, 5]
    lvalid = lights[:, 0] < _FAR / 2
    phase = _light_phases(cfg, lights, state.step)
    is_red = (phase == 2) & lvalid

    fwd = _heading(state.yaw)
    tail_close = state.pos - 0.8 * _VEH_EXTENT * fwd
    tail_far = state.pos - (_VEH_EXTENT + 1.0) * fwd
    center = lights[:, :2]
    d_center = jnp.linalg.norm(center - state.pos[None], axis=-1)
    near = d_center <= 10.0                                 # DISTANCE_LIGHT

    ldir = lights[:, 3:5]
    same_dir = (ldir @ fwd) > 0.0
    rel = tail_far[None] - center
    lateral = jnp.abs(rel[:, 0] * ldir[:, 1] - rel[:, 1] * ldir[:, 0])
    lane_ok = same_dir & (lateral <= 0.8 * _LANE_WIDTH)

    perp = jnp.stack([-ldir[:, 1], ldir[:, 0]], axis=-1)
    half = 0.4 * _LANE_WIDTH
    lft = center + half * perp                              # [L, 2]
    rgt = center - half * perp

    def orient(a, b, c):
        v = ((b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1])
             - (b[..., 1] - a[..., 1]) * (c[..., 0] - a[..., 0]))
        return jnp.sign(jnp.where(jnp.abs(v) < 1e-12, 0.0, v))

    p1, p2 = tail_close[None], tail_far[None]
    o1, o2 = orient(p1, p2, lft), orient(p1, p2, rgt)
    o3, o4 = orient(lft, rgt, p1), orient(lft, rgt, p2)
    crossed = (o1 != o2) & (o3 != o4)

    idx = jnp.arange(lights.shape[0])
    fire = is_red & near & lane_ok & crossed & (idx != state.last_red)
    any_fire = jnp.any(fire)
    fired_idx = jnp.argmax(fire)
    last_red = jnp.where(any_fire, fired_idx,
                         state.last_red).astype(jnp.int32)
    infr = state.infractions.at[0].add(any_fire.astype(jnp.int32))
    return state._replace(last_red=last_red, infractions=infr)


def _point_in_bb(p, center, ext, yaw_deg):
    """Oriented-bbox containment, batched over boxes [S, ...] for a point
    [2] (traffic_lights.py::_point_inside_bb)."""
    c = jnp.cos(jnp.deg2rad(yaw_deg))
    s = jnp.sin(jnp.deg2rad(yaw_deg))
    rel = p[None] - center
    lx = c * rel[..., 0] + s * rel[..., 1]
    ly = -s * rel[..., 0] + c * rel[..., 1]
    return (jnp.abs(lx) < ext[..., 0]) & (jnp.abs(ly) < ext[..., 1])


def _stop_sign_check(cfg: JaxEnvConfig, bank: RouteBank, state: JaxEnvState
                     ) -> JaxEnvState:
    """Vectorized RunningStopCriterion (traffic_lights.py:320-388 ≙
    atomic_criteria.py:2076+): scan -> target acquisition when the ego's
    20 m forward horizon enters a trigger bbox -> require speed < 0.1
    before leaving the influence region, else one STOP_INFRACTION."""
    signs = bank.stop_signs[state.route_id]                 # [S, 5]
    svalid = signs[:, 0] < _FAR / 2
    if signs.shape[0] == 0:
        return state
    center, ext, yaw = signs[:, :2], signs[:, 2:4], signs[:, 4]
    fwd = _heading(state.yaw)
    d = jnp.linalg.norm(center - state.pos[None], axis=-1)
    # 21-point forward horizon at 1 m steps (WAYPOINT_STEP/HORIZON_STEPS)
    ks = jnp.arange(21, dtype=jnp.float32)
    pts = state.pos[None] + ks[:, None] * fwd[None]         # [21, 2]
    inside = jax.vmap(lambda p: _point_in_bb(p, center, ext, yaw))(pts)
    affected_now = svalid & (d <= 50.0) & jnp.any(inside, axis=0)   # [S]

    target, stopped, affected = (state.stop_state[0], state.stop_state[1],
                                 state.stop_state[2])
    no_target = target < 0
    first = jnp.argmax(affected_now)
    acquired = no_target & jnp.any(affected_now)
    target_i = jnp.where(acquired, first, target.astype(jnp.int32))

    has_target = ~no_target
    ti = jnp.clip(target_i, 0, signs.shape[0] - 1).astype(jnp.int32)
    stopped = jnp.where(has_target & (state.speed < 0.1), 1.0, stopped)
    ego_in = _point_in_bb(state.pos, center[ti][None], ext[ti][None],
                          yaw[ti][None])[0]
    affected = jnp.where(has_target & ego_in, 1.0, affected)
    leaving = has_target & ~affected_now[ti]
    infraction = leaving & (affected >= 0.5) & (stopped < 0.5)

    # on leave (or fresh acquire) reset the machine
    target_o = jnp.where(leaving, -1, target_i).astype(jnp.float32)
    stopped = jnp.where(leaving | acquired, 0.0, stopped)
    affected = jnp.where(leaving | acquired, 0.0, affected)
    infr = state.infractions.at[1].add(infraction.astype(jnp.int32))
    return state._replace(
        stop_state=jnp.stack([target_o, stopped, affected]),
        infractions=infr)


def _physics(cfg: JaxEnvConfig, bank: RouteBank, state: JaxEnvState,
             control: jnp.ndarray) -> Tuple[JaxEnvState, jnp.ndarray]:
    """One dynamics tick (SimDrivingEnv._world_step). Returns (state,
    collision[3] bool: static, vehicle, walker)."""
    steer = jnp.clip(control[0], -1.0, 1.0)
    throttle = jnp.clip(control[1], 0.0, 1.0)
    brake = jnp.clip(control[2], 0.0, 1.0)
    accel = 3.5 * throttle - 8.0 * brake - 0.08 * state.speed
    speed = jnp.maximum(0.0, state.speed + accel * cfg.dt)
    wheel = steer * _MAX_WHEEL
    yaw_rate = speed / _WHEELBASE * jnp.tan(wheel)
    yaw = state.yaw + jnp.rad2deg(yaw_rate * cfg.dt)
    pos = state.pos + _heading(yaw) * speed * cfg.dt

    obs = state.obstacles
    bound = state.npc_s >= 0.0                  # route-driving vehicles
    mover = (obs[:, 4] > 0) & ~bound            # walkers wander
    delta = obs[:, 4:5] * cfg.dt * jnp.stack(
        [jnp.cos(obs[:, 5]), jnp.sin(obs[:, 5])], axis=-1)
    new_xy = jnp.where(mover[:, None], obs[:, :2] + delta, obs[:, :2])

    # route-driving NPC vehicles: kinematic car-followers on the dense
    # route (CARLA traffic-manager autopilot over the ego's lane — the
    # FollowLeadingVehicle / OtherLeadingVehicle pressure of NoCrash
    # traffic). Hold for anything ahead within npc_gap (ego or another
    # NPC) and for red lights at their stop line, else track cruise.
    route = bank.routes[state.route_id]
    rlen = bank.route_len[state.route_id].astype(jnp.float32)
    s = jnp.maximum(state.npc_s, 0.0)
    i0 = jnp.clip(s.astype(jnp.int32), 0, route.shape[0] - 2)
    pcur = route[i0] + (s - i0)[:, None] * (route[i0 + 1] - route[i0])
    seg = route[i0 + 1] - route[i0]
    dirn = seg / jnp.maximum(
        jnp.linalg.norm(seg, axis=-1, keepdims=True), 1e-6)
    others = jnp.concatenate([obs[:, :2], pos[None]], axis=0)  # [M+1, 2]
    relo = others[None, :, :] - pcur[:, None, :]
    fwd_d = jnp.einsum("mnk,mk->mn", relo, dirn)
    lat_d = jnp.abs(relo[..., 0] * dirn[:, 1:2]
                    - relo[..., 1] * dirn[:, 0:1])
    m = obs.shape[0]
    not_self = ~jnp.eye(m, m + 1, dtype=bool)
    held = jnp.any((fwd_d > 0.1) & (fwd_d < cfg.npc_gap)
                   & (lat_d < 2.5) & not_self, axis=1)
    lights = bank.lights[state.route_id]
    red = (_light_phases(cfg, lights, state.step) == 2) & \
        (lights[:, 0] < _FAR / 2)
    rell = lights[None, :, :2] - pcur[:, None, :]
    lfwd = jnp.einsum("mlk,mk->ml", rell, dirn)
    llat = jnp.abs(rell[..., 0] * dirn[:, 1:2]
                   - rell[..., 1] * dirn[:, 0:1])
    same = jnp.einsum("lk,mk->ml", lights[:, 3:5], dirn) > 0.0
    held = held | jnp.any(red[None, :] & (lfwd > 0.0) & (lfwd < 10.0)
                          & (llat < 0.8 * _LANE_WIDTH) & same, axis=1)
    target = jnp.where(held, 0.0, state.npc_cruise)
    v = jnp.maximum(0.0, jnp.clip(target,
                                  obs[:, 4] - cfg.npc_accel * cfg.dt,
                                  obs[:, 4] + cfg.npc_accel * cfg.dt))
    s_new = s + v * cfg.dt
    # past the route end: recycle to the start unless the ego is near it.
    # Clearance 25 m: at worst-case closing speed (ego max_speed 9 +
    # npc_cruise hi 6.5 = 15.5 m/s) a 12 m gap closes in under a second,
    # so a respawn just outside a small radius could still drop a vehicle
    # effectively "next to" an approaching ego (e.g. a later route leg
    # passing the start point) and end the episode with a spurious
    # collision; 25 m gives the ego >1.5 s to react like real traffic.
    near_start = jnp.linalg.norm(route[1] - pos) < 25.0
    s_new = jnp.where(s_new >= rlen - 2.0,
                      jnp.where(near_start, rlen - 2.0, 1.0), s_new)
    i0n = jnp.clip(s_new.astype(jnp.int32), 0, route.shape[0] - 2)
    pnew = route[i0n] + (s_new - i0n)[:, None] * (route[i0n + 1]
                                                  - route[i0n])
    new_xy = jnp.where(bound[:, None], pnew, new_xy)
    obs = obs.at[:, :2].set(new_xy)
    obs = obs.at[:, 4].set(jnp.where(bound, v, obs[:, 4]))
    obs = obs.at[:, 5].set(jnp.where(
        bound, jnp.arctan2(dirn[:, 1], dirn[:, 0]), obs[:, 5]))
    npc_s = jnp.where(bound, s_new, state.npc_s)
    state = state._replace(npc_s=npc_s)

    d = jnp.linalg.norm(obs[:, :2] - pos[None], axis=-1)
    hit = d < obs[:, 2] + _EGO_RADIUS
    kind = obs[:, 3].astype(jnp.int32)
    collision = jnp.stack([jnp.any(hit & (kind == 2)),
                           jnp.any(hit & (kind == 0)),
                           jnp.any(hit & (kind == 1))])
    return state._replace(pos=pos, yaw=yaw, speed=speed, obstacles=obs,
                          step=state.step + 1), collision


def _reward_step(cfg: JaxEnvConfig, state: JaxEnvState, scal, collision,
                 obstacle, route_completed, route_m):
    """compute_reward (env_wrapper.py:361-482) as branch-free jnp math."""
    nz = jnp.asarray(0.0)
    begin = state.begin > 0
    in_turn = state.turn[7] >= 0.5

    coll_static = collision[0] & ~begin
    coll_vehicle = collision[1] & ~begin
    coll_walker = collision[2] & ~begin
    deviation = (scal["off_route"] > cfg.max_offroad) & ~begin
    # OUTSIDE_ROUTE_LANES_INFRACTION -> steer -1 + done ("outside route!",
    # env_wrapper.py:421-425 / reward.py) — same handling as the host env.
    # Suppressed inside turns: the reference relaxes its lane checks at
    # junctions ("Lanes and roads are too chaotic at junctions",
    # atomic_criteria.py:1183), and a vehicle physically cannot track the
    # synthetic route's sharp corner polylines within the lane envelope
    # (min turning radius ~4.1 m at full wheel lock)
    outside = scal["off_lane"] & ~begin & ~in_turn
    completed = route_completed & ~begin

    steer_ev = (-1.0 * coll_static - 1.0 * (deviation | outside)
                + 5.0 * completed)
    throttle_ev = (-1.0 * (coll_vehicle | coll_walker) + 5.0 * completed)

    done = (coll_vehicle | coll_walker | deviation | outside | completed
            | (coll_static & cfg.training))
    steer_done = coll_static | deviation | outside | completed
    throttle_done = coll_vehicle | coll_walker | completed

    # error codes, later writers win as in the sequential reference checks
    err = jnp.asarray(0, jnp.int32)
    err = jnp.where(coll_static, 1, err)
    err = jnp.where(coll_vehicle, 2, err)
    err = jnp.where(coll_walker, 3, err)
    err = jnp.where(outside, 9, err)
    err = jnp.where(deviation, 5, err)
    err = jnp.where(completed, 6, err)

    # theta reward with the 30-degree in-turn grace
    degree = jnp.abs(jnp.rad2deg(scal["theta"]))
    degree = jnp.where(in_turn, jnp.maximum(nz, degree - 30.0), degree)
    theta_r = jnp.maximum(nz, 1.0 - degree / cfg.max_degree)

    # overspeed
    over = state.speed > cfg.max_speed
    throttle_ev = throttle_ev - over.astype(jnp.float32)
    throttle_done = throttle_done | over
    done = done | (over & cfg.training)
    err = jnp.where(over & cfg.training & (err == 0), 7, err)

    # obstacle-aware speed shaping
    detect = (obstacle > -1.0) & (obstacle < 12.0)
    tgt = jnp.maximum(nz, obstacle - 5.0)
    shaped = 1.0 - jnp.maximum(state.speed - tgt, nz) / \
        jnp.maximum(cfg.max_speed - tgt, 1e-9)
    shaped = jnp.where(obstacle < 5.0,
                       jnp.where(state.speed > 0.1, -1.0, 1.0), shaped)
    slow = state.speed / cfg.min_speed
    fast = jnp.maximum(nz, 1.0 - (state.speed - cfg.target_speed)
                       / (cfg.max_speed - cfg.target_speed))
    speed_r = jnp.where(
        detect, shaped,
        jnp.where(state.speed < cfg.min_speed, slow,
                  jnp.where(state.speed > cfg.target_speed, fast, 1.0)))

    # deviation reward
    d_max = jnp.where(in_turn, cfg.d_max_turn, cfg.d_max_straight)
    d_max = jnp.where(jnp.asarray(cfg.training), d_max, cfg.d_max_eval)
    deviation_r = jnp.maximum(nz, 1.0 - scal["dis"] / d_max)

    # block timeout (speed<1 for max_block_steps)
    last_t = jnp.where(detect, state.step, state.last_event_t)
    blocked = (state.speed < 1.0) & \
        ((state.step - last_t) > cfg.max_block_steps)
    done = done | blocked
    throttle_ev = throttle_ev - 2.0 * blocked.astype(jnp.float32)
    throttle_done = throttle_done | blocked
    err = jnp.where(blocked & (err == 0), 4, err)
    had_event = coll_static | coll_vehicle | coll_walker | deviation \
        | completed | blocked
    last_t = jnp.where(had_event | (state.speed > 1.0), state.step, last_t)

    # route-length-scaled episode timeout: ends the episode with the partial
    # completion and NO reward change (the host's ROUTE_COMPLETION event
    # handling, reward.py:104-109; routes are 1 m spaced so route_len is the
    # length in meters)
    if cfg.route_timeout:
        timeout_ticks = (0.8 * route_m + 5.0) / cfg.dt
        timed_out = state.step.astype(jnp.float32) >= timeout_ticks
        done = done | timed_out
        err = jnp.where(timed_out & (err == 0), 8, err)

    rewards = jnp.stack([(deviation_r + theta_r) / 2.0 + steer_ev,
                         speed_r + throttle_ev])
    action_done = jnp.stack([steer_done, throttle_done]).astype(jnp.int32)
    new_state = state._replace(last_event_t=last_t.astype(jnp.int32),
                               begin=jnp.asarray(0, jnp.int32))
    return new_state, rewards, done, action_done, err


# ---------------------------------------------------------------- rendering
#
# Every primitive (route-fig ribbon disks, prop/obstacle/light rects, route
# markers) becomes a row of a shape TABLE painted in order by ONE
# cadre_tpu.ops.paint pass — VMEM-resident Pallas kernel on TPU, scan
# fallback elsewhere, bit-identical either way. This replaces the former
# per-primitive lax.scan passes (~100 HBM canvas round trips per frame,
# the measured ~20% device-env render tax).

def _render_fig(cfg: JaxEnvConfig, bank: RouteBank, state: JaxEnvState,
                scal) -> jnp.ndarray:
    """Route-figure raster [256, 144] (env_wrapper.py:240-344 via the
    ribbon-of-disks equivalence in route_fig.rasterize_polyline)."""
    w_pts, mask = scal["w"], scal["list_mask"]
    c = jnp.deg2rad(state.yaw) + jnp.pi / 2
    rot = jnp.asarray([[jnp.cos(c), jnp.sin(c)],
                       [-jnp.sin(c), jnp.cos(c)]]).T   # pts @ R as route_fig
    px = PIXELS_PER_METER * ((w_pts - state.pos[None]) @ rot)
    px = px + jnp.asarray([_FW / 2.0, _FH / 2.0])
    # two interpolated samples per 1 m segment (~1.8 px spacing)
    a, b = px[:-1], px[1:]
    seg_ok = mask[:-1] & mask[1:]
    mid = (a + b) / 2.0
    centers = jnp.concatenate([px[:1], mid, b])
    ok = jnp.concatenate([mask[:1], seg_ok, seg_ok])
    cx = jnp.where(ok, centers[:, 0], -1e6)
    cy = jnp.where(ok, centers[:, 1], -1e6)
    r2 = jnp.full(cx.shape, (LINE_WIDTH / 2.0) ** 2, jnp.float32)
    rows = paint.disk_rows(cx, cy, r2, jnp.asarray([255.0] * 3), ok)
    fig = jnp.zeros((_FH, _FW, 1), jnp.float32)
    return paint.paint_shapes(fig, rows)[..., 0]


def _render_rgb(cfg: JaxEnvConfig, bank: RouteBank, state: JaxEnvState,
                key) -> jnp.ndarray:
    """Forward camera [144, 256, 3] f32 0..255 (SimDrivingEnv._render_rgb)."""
    h, w = _H, _W
    horizon = h // 2
    sky = jnp.asarray(_SKY)[state.weather]
    bright = jnp.asarray(_BRIGHT)[state.weather]
    noise_std = jnp.asarray(_NOISE)[state.weather]

    yy = jnp.arange(h)[:, None, None]
    img = jnp.where(yy < horizon, sky[None, None],
                    jnp.asarray([90.0, 90.0, 90.0])[None, None])
    img = jnp.broadcast_to(img, (h, w, 3)).astype(jnp.float32)

    yawr = jnp.deg2rad(state.yaw)
    cos_y, sin_y = jnp.cos(yawr), jnp.sin(yawr)

    def to_cam(p):
        rel = p - state.pos[None]
        xf = rel[:, 0] * cos_y + rel[:, 1] * sin_y
        yl = -rel[:, 0] * sin_y + rel[:, 1] * cos_y
        return xf, yl

    table = []

    # roadside props (sim_env.roadside_props twin): interleaved
    # (body, sign-head) rects per prop in bank order, matching the host
    # renderer's paint order pixel-for-pixel
    props = bank.props[state.route_id]                     # [P, 6]
    if props.shape[0]:
        pvalid = props[:, 0] < _FAR / 2
        xf, yl = to_cam(props[:, :2])
        okp = pvalid & (xf >= 2.0) & (xf <= 60.0)
        xf_s = jnp.maximum(xf, 1e-3)
        u = w / 2.0 - _FOCAL * yl / xf_s
        vg = horizon + _FOCAL * _CAM_H / xf_s
        vt = horizon - _FOCAL * (props[:, 3] - _CAM_H) / xf_s
        r = jnp.maximum(1.0, jnp.floor(_FOCAL * props[:, 2] / xf_s))
        kind, shade = props[:, 4], props[:, 5]
        is_pole = kind == 5.0
        col = jnp.where(
            (kind == 4.0)[:, None],
            jnp.stack([100.0 + 60.0 * shade, 95.0 + 55.0 * shade,
                       90.0 + 50.0 * shade], axis=-1),
            jnp.where((kind == 6.0)[:, None],
                      jnp.stack([jnp.full_like(shade, 30.0),
                                 110.0 + 70.0 * shade,
                                 jnp.full_like(shade, 35.0)], axis=-1),
                      jnp.broadcast_to(jnp.asarray([140.0, 140.0, 140.0]),
                                       (props.shape[0], 3))))
        rs = jnp.maximum(1.0, jnp.floor(_FOCAL * 0.5 / xf_s))
        sign_col = jnp.broadcast_to(jnp.asarray([200.0, 180.0, 40.0]),
                                    (props.shape[0], 3))

        def ileave(a, b):
            return jnp.stack([a, b], axis=1).reshape(
                (2 * props.shape[0],) + a.shape[1:])

        table.append(paint.rect_rows(
            ileave(u - r, u - rs), ileave(u + r, u + rs),
            ileave(vt, vt - rs), ileave(vg, vt + rs),
            ileave(col, sign_col), ileave(okp, okp & is_pole)))

    # route markers: every 2nd waypoint of a 64-entry window ahead
    wnd, valid, _ = _route_window(cfg, bank, state, cfg.rgb_window)
    pts = wnd[::2]
    pvalid = valid[::2]
    xf, yl = to_cam(pts)
    vis = (xf >= 1.0) & (xf <= 60.0) & pvalid
    xf_s = jnp.maximum(xf, 1e-3)
    us = w / 2.0 - _FOCAL * yl / xf_s
    vs = horizon + _FOCAL * _CAM_H / xf_s
    rs = jnp.maximum(1.0, jnp.floor(24.0 / xf_s))
    on = vis & (us >= 0) & (us < w) & (vs >= 0) & (vs < h)
    # square stamps ~ disks of the same half-size on this canvas
    table.append(paint.disk_rows(us, vs, rs * rs,
                                 jnp.asarray([200.0, 200.0, 200.0]), on))

    # obstacle blobs: color by kind, rect [v-2r, v) x [u-r, u+r)
    ob = state.obstacles
    xf, yl = to_cam(ob[:, :2])
    okd = (xf >= 1.0) & (xf <= 60.0)
    xf_s = jnp.maximum(xf, 1e-3)
    u = w / 2.0 - _FOCAL * yl / xf_s
    v = horizon + _FOCAL * _CAM_H / xf_s
    okd = okd & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    r = jnp.maximum(2.0, jnp.floor(_FOCAL * ob[:, 2] / xf_s))
    is_walker = ob[:, 3].astype(jnp.int32) == 1
    col = jnp.where(is_walker[:, None],
                    jnp.asarray([40.0, 40.0, 200.0])[None],
                    jnp.asarray([200.0, 40.0, 40.0])[None])
    table.append(paint.rect_rows(u - r, u + r, v - 2 * r, v, col, okd))

    # traffic lights: head box + pole, forced short cycle
    lights = bank.lights[state.route_id]                   # [L, 5]
    lvalid = lights[:, 0] < _FAR / 2
    phase = _light_phases(cfg, lights, state.step)
    xf, yl = to_cam(lights[:, :2])
    okl = (xf >= 1.5) & (xf <= 60.0) & lvalid
    xf_s = jnp.maximum(xf, 1e-3)
    u = w / 2.0 - _FOCAL * yl / xf_s
    v = horizon - _FOCAL * (5.0 - _CAM_H) / xf_s
    okl = okl & (u >= 0) & (u < w)
    r = jnp.maximum(2.0, jnp.floor(_FOCAL * 0.6 / xf_s))
    # canvas-top clamp for close lights (host twin does the same): every
    # frame labeled by the light head's ground truth keeps visible pixels
    v = jnp.maximum(v, r)
    vg = horizon + _FOCAL * _CAM_H / xf_s
    lcol = jnp.asarray(_LIGHT_COLORS)[phase]
    pole = jnp.broadcast_to(jnp.asarray([60.0, 60.0, 60.0]),
                            lcol.shape)
    # pole first, then the head box on top of it
    table.append(paint.rect_rows(u - 1.0, u + 1.0, v + r, vg, pole, okl))
    table.append(paint.rect_rows(u - r, u + r, v - r, v + r, lcol, okl))

    img = paint.paint_shapes(img, jnp.concatenate(table, axis=0))

    # weather: ground brightness + sensor noise
    ground = yy >= horizon
    img = jnp.where(ground, img * bright, img)
    noise = jax.random.normal(key, (h, w, 3)) * noise_std
    img = jnp.clip(img + noise, 0.0, 255.0)
    return img


# ---------------------------------------------------------------- lifecycle

def _reset_one(cfg: JaxEnvConfig, bank: RouteBank, key,
               prio: Optional[jnp.ndarray] = None,
               force_route: Optional[jnp.ndarray] = None) -> JaxEnvState:
    """Fresh episode (SimDrivingEnv._world_reset over the device bank).
    `force_route` pins the episode to one route id (the sequential
    RouteIndexer eval semantics, route_indexer.py:6-41)."""
    k_route, k_obs, k_weather, k_state = jax.random.split(key, 4)
    n_routes = bank.routes.shape[0]
    if prio is None:
        prio = jnp.full((n_routes,), 100.0, jnp.float32)
    if force_route is not None:
        route_id = jnp.asarray(force_route, jnp.int32)
    elif cfg.priority_routes:
        # PriorityRouteIndexer.next (priority_route_indexer.py:51-61):
        # 20% uniform, else softmax over priority = 100 - completion%
        k_eps, k_soft, k_uni = jax.random.split(k_route, 3)
        soft = jax.random.categorical(k_soft, prio)
        uni = jax.random.randint(k_uni, (), 0, n_routes)
        route_id = jnp.where(jax.random.uniform(k_eps) > 0.8, uni, soft)
    else:
        route_id = jax.random.randint(k_route, (), 0, n_routes)
    route = bank.routes[route_id]
    rlen = bank.route_len[route_id]
    start = route[0]
    d0 = route[jnp.minimum(3, rlen - 1)] - start
    yaw = jnp.rad2deg(jnp.arctan2(d0[1], d0[0]))

    # at least one (inert, far-away) obstacle row so the collision and
    # obstacle-cone reductions never run over a zero-length axis
    m = max(cfg.n_vehicles + cfg.n_walkers + cfg.n_hazards
            + cfg.n_junction_hazards, 1)
    # 7-way split as before junction hazards existed; the two extra keys
    # derive via fold_in so every pre-existing config's spawn stream stays
    # bit-identical (mid-grid reproducibility)
    keys = list(jax.random.split(k_obs, 7)) + \
        [jax.random.fold_in(k_obs, 101), jax.random.fold_in(k_obs, 102)]
    lo = rlen // 4
    idx = jax.random.randint(keys[0], (m,), 0, 1 << 30) % \
        jnp.maximum(rlen - lo, 1) + lo
    base = route[idx]
    lat_w = jax.random.uniform(keys[1], (m, 2), minval=-3.0, maxval=3.0)
    rank = jnp.arange(m)
    is_walker = rank >= cfg.n_vehicles
    # vehicles sit ON the route line (they drive it — see _physics);
    # walkers wander at a lateral offset
    pos = base + jnp.where(is_walker[:, None], lat_w, 0.0)
    radius = jnp.where(is_walker, 0.4, 1.2)
    kind = jnp.where(is_walker, 1, 0).astype(jnp.float32)
    w_speed = jax.random.uniform(keys[2], (m,), minval=0.3, maxval=1.2)
    cruise = jax.random.uniform(keys[6], (m,), minval=cfg.npc_cruise[0],
                                maxval=cfg.npc_cruise[1])
    is_vehicle = ~is_walker & (rank < cfg.n_vehicles)
    speed = jnp.where(is_walker, w_speed, jnp.where(is_vehicle, cruise, 0.0))
    heading = jax.random.uniform(keys[3], (m,), minval=0.0,
                                 maxval=2.0 * jnp.pi)

    # crossing hazards (DynamicObjectCrossing, object_crash_vehicle.py):
    # armed at `hazard_offset` m beside a route point, speed 0 until sprung,
    # heading pointing back across the route
    is_hazard = (rank >= (cfg.n_vehicles + cfg.n_walkers)) & \
        (rank < (cfg.n_vehicles + cfg.n_walkers + cfg.n_hazards))
    dnext = route[jnp.minimum(idx + 2, rlen - 1)] - base
    dnorm = dnext / jnp.maximum(
        jnp.linalg.norm(dnext, axis=-1, keepdims=True), 1e-6)
    perp = jnp.stack([-dnorm[:, 1], dnorm[:, 0]], axis=-1)
    side = jnp.where(
        jax.random.bernoulli(keys[4], shape=(m,)), 1.0, -1.0)
    pos = jnp.where(is_hazard[:, None],
                    base + side[:, None] * cfg.hazard_offset * perp, pos)
    heading = jnp.where(
        is_hazard,
        jnp.arctan2(-side * perp[:, 1], -side * perp[:, 0]), heading)
    speed = jnp.where(is_hazard, 0.0, speed)
    hazard_speed = jnp.where(
        is_hazard,
        jax.random.uniform(keys[5], (m,), minval=1.2, maxval=2.0), 0.0)

    # junction crossers (VehicleTurningRoute, object_crash_intersection.py:
    # 689 — the crosser IS a cyclist, vehicle collision class): armed
    # beside a signalized junction (the corner lights carry the junction
    # centers + route direction), crossing perpendicular to the route.
    # Routes with fewer lights than crossers leave the extras on the _FAR
    # light pad — never sprung, invisible, exactly like absent scenarios.
    is_jhazard = rank >= (cfg.n_vehicles + cfg.n_walkers + cfg.n_hazards)
    if cfg.n_junction_hazards > 0:
        jl = bank.lights[route_id]
        n_live = jnp.sum(jl[:, 0] < _FAR / 2)   # live slots lead the pad
        l_idx = jax.random.randint(keys[7], (m,), 0, 1 << 30) \
            % jnp.maximum(n_live, 1)
        jxy = jl[l_idx, :2]
        jdir = jl[l_idx, 3:5]
        jperp = jnp.stack([-jdir[:, 1], jdir[:, 0]], axis=-1)
        pos = jnp.where(is_jhazard[:, None],
                        jxy + side[:, None] * cfg.hazard_offset * jperp,
                        pos)
        heading = jnp.where(
            is_jhazard,
            jnp.arctan2(-side * jperp[:, 1], -side * jperp[:, 0]),
            heading)
        speed = jnp.where(is_jhazard, 0.0, speed)
        hazard_speed = jnp.where(
            is_jhazard,
            jax.random.uniform(keys[8], (m,),
                               minval=cfg.junction_hazard_speed[0],
                               maxval=cfg.junction_hazard_speed[1]),
            hazard_speed)
        kind = jnp.where(is_jhazard, 0.0, kind)     # vehicle class
        radius = jnp.where(is_jhazard, 0.6, radius)  # cyclist footprint

    real = rank < (cfg.n_vehicles + cfg.n_walkers + cfg.n_hazards
                   + cfg.n_junction_hazards)
    pos = jnp.where(real[:, None], pos, 1.0e7)
    radius = jnp.where(real, radius, 0.0)
    speed = jnp.where(real, speed, 0.0)
    hazard_speed = jnp.where(real, hazard_speed, 0.0)
    npc_s = jnp.where(is_vehicle & real, idx.astype(jnp.float32), -1.0)
    npc_cruise = jnp.where(is_vehicle & real, cruise, 0.0)
    obstacles = jnp.stack(
        [pos[:, 0], pos[:, 1], radius, kind, speed, heading], axis=-1)

    weather = jnp.where(
        jnp.asarray(cfg.randomize_weather),
        jax.random.randint(k_weather, (), 0, len(_WNAMES)),
        jnp.asarray(0))
    return JaxEnvState(
        route_id=route_id.astype(jnp.int32),
        head=jnp.asarray(0, jnp.int32), progress=jnp.asarray(0, jnp.int32),
        pos=start.astype(jnp.float32),
        yaw=yaw.astype(jnp.float32), speed=jnp.asarray(0.0, jnp.float32),
        step=jnp.asarray(0, jnp.int32),
        last_event_t=jnp.asarray(0, jnp.int32),
        begin=jnp.asarray(1, jnp.int32), obstacles=obstacles,
        hazard_speed=hazard_speed, npc_s=npc_s, npc_cruise=npc_cruise,
        weather=weather.astype(jnp.int32),
        turn=jnp.zeros(8, jnp.float32),
        last_red=jnp.asarray(-1, jnp.int32),
        stop_state=jnp.asarray([-1.0, 0.0, 0.0], jnp.float32),
        infractions=jnp.zeros(2, jnp.int32),
        route_prio=prio.astype(jnp.float32), rng=k_state)


def _observe(cfg: JaxEnvConfig, bank: RouteBank, state: JaxEnvState, scal,
             key) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    meas = jnp.stack([state.speed / cfg.max_speed, scal["dis"] / 3.0,
                      jnp.abs(jnp.rad2deg(scal["theta"])) / 90.0])
    if cfg.blind_route:
        meas = meas * jnp.asarray([1.0, 0.0, 0.0])
    if not cfg.render:
        return (jnp.zeros((_H, _W, 3), jnp.float32),
                jnp.zeros((_FH, _FW), jnp.float32), meas)
    rgb = _render_rgb(cfg, bank, state, key)
    fig = _render_fig(cfg, bank, state, scal)
    return rgb, fig, meas


def _spring_hazards(cfg: JaxEnvConfig, state: JaxEnvState) -> JaxEnvState:
    """Arm check for crossing hazards: an armed (speed-0) hazard within
    `hazard_trigger` m of the ego starts its crossing walk (the
    DynamicObjectCrossing trigger, object_crash_vehicle.py). Once sprung
    its speed is nonzero, so the test never re-fires."""
    if cfg.n_hazards == 0 and cfg.n_junction_hazards == 0:
        return state
    obs = state.obstacles
    d = jnp.linalg.norm(obs[:, :2] - state.pos[None], axis=-1)
    fire = (d < cfg.hazard_trigger) & (state.hazard_speed > 0.0) & \
        (obs[:, 4] == 0.0)
    obs = obs.at[:, 4].set(jnp.where(fire, state.hazard_speed, obs[:, 4]))
    return state._replace(obstacles=obs)


def _step_one(cfg: JaxEnvConfig, bank: RouteBank, state: JaxEnvState,
              control: jnp.ndarray) -> Tuple[JaxEnvState, StepOutput]:
    """One env tick with auto-reset; `control` = [steer, throttle, brake]."""
    rng, k_reset, k_noise = jax.random.split(state.rng, 3)
    state = state._replace(rng=rng)

    stepped, collision = _physics(cfg, bank, _spring_hazards(cfg, state),
                                  control)
    stepped = _red_light_check(cfg, bank, stepped)
    stepped = _stop_sign_check(cfg, bank, stepped)
    stepped = _plan_pop(cfg, bank, stepped)
    scal = _scalars(cfg, bank, stepped)
    stepped = _update_turn(stepped, scal["w"], scal["list_mask"])
    stepped, completion, route_completed = _update_progress(bank, stepped)
    obstacle = _nearest_obstacle_ahead(stepped)
    route_m = bank.route_len[stepped.route_id].astype(jnp.float32)
    stepped, rewards, done, action_done, err = _reward_step(
        cfg, stepped, scal, collision, obstacle, route_completed, route_m)

    # curriculum bookkeeping (PriorityRouteIndexer.update_route,
    # priority_route_indexer.py:42-49): at episode end the finished
    # route's priority becomes 100 - completion%. The fresh episode
    # samples from (and carries) the updated table.
    prio = stepped.route_prio.at[stepped.route_id].set(jnp.where(
        done, 100.0 * (1.0 - completion),
        stepped.route_prio[stepped.route_id]))
    stepped = stepped._replace(route_prio=prio)
    fresh = _plan_pop(cfg, bank, _reset_one(cfg, bank, k_reset, prio))
    nxt = jax.tree.map(lambda a, b: jnp.where(done, a, b), fresh, stepped)
    scal_n = _scalars(cfg, bank, nxt)
    rgb, fig, meas = _observe(cfg, bank, nxt, scal_n, k_noise)

    return nxt, StepOutput(
        rgb=rgb, route_fig=fig, measurements=meas,
        command=jnp.asarray(3, jnp.int32), rewards=rewards, done=done,
        action_done=action_done, completion=completion, error_code=err,
        infractions=stepped.infractions)


# ---------------------------------------------------------------- public API

class JaxDrivingEnv:
    """Batched device-resident env over a RouteBank.

    reset(key) -> (state, obs-dict); step(state, controls) -> (state,
    StepOutput) with every leaf batched [N, ...]. Both are pure and jit/scan
    composable; `step` auto-resets finished envs (the returned obs is the
    FIRST frame of the fresh episode, so rollout loops reset policy
    hidden/history wherever `done`).
    """

    def __init__(self, bank: RouteBank, num_envs: int,
                 config: JaxEnvConfig = JaxEnvConfig()):
        self.bank = bank
        self.num_envs = num_envs
        self.cfg = config
        cfg = config

        def _obs(state):
            def obs_one(s):
                rng, k_noise = jax.random.split(s.rng)
                s = s._replace(rng=rng)
                scal = _scalars(cfg, bank, s)
                rgb, fig, meas = _observe(cfg, bank, s, scal, k_noise)
                return s, dict(rgb=rgb, route_fig=fig, measurements=meas,
                               command=jnp.asarray(3, jnp.int32))

            return jax.vmap(obs_one)(state)

        def _reset(key):
            keys = jax.random.split(key, num_envs)
            state = jax.vmap(lambda k: _plan_pop(
                cfg, bank, _reset_one(cfg, bank, k)))(keys)
            return _obs(state)

        def _reset_routes(key, route_ids):
            # sequential-RouteIndexer eval: env i pinned to route_ids[i]
            keys = jax.random.split(key, num_envs)
            state = jax.vmap(lambda k, r: _plan_pop(
                cfg, bank, _reset_one(cfg, bank, k, force_route=r)))(
                    keys, jnp.asarray(route_ids, jnp.int32))
            return _obs(state)

        def _step(state, controls):
            return jax.vmap(lambda s, c: _step_one(cfg, bank, s, c))(
                state, controls)

        self.reset = jax.jit(_reset)
        self.reset_routes = jax.jit(_reset_routes)
        self.step = jax.jit(_step)
