"""Traffic-light and stop-sign subsystem: geometry, state, and criteria.

The reference implements this in two places the round-1 build left as dead
code:

- light annotation / trigger-volume geometry / state forcing on the
  provider (srunner/scenariomanager/carla_data_provider.py:309-414), and
- the geometric infraction tests (srunner/.../atomic_criteria.py:1836-2075
  RunningRedLightTest with stop-line segment crossing, APPROACH_LIGHT
  emission, and once-per-light debounce via `_last_red_light_id`; :2076+
  RunningStopTest's scan/stop/leave state machine).

Here the geometry is simulator-agnostic: lights and stop signs are plain
records (`TrafficLightInfo`, `StopSignInfo`) expressed in the same planar
space the criteria operate in. `SimDrivingEnv` synthesizes them at route
junctions and runs their state machines; `CarlaDrivingEnv` builds them from
server actors via `CarlaProvider.get_light_infos` and refreshes `state`
per tick. The criteria below then work identically against both worlds.

CADRE forces short cycles on every light so training sees all phases
(atomic_criteria.py:1869-1871): green 5 s, yellow 3 s, red 0.5 s.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence

import numpy as np

from cadre_tpu.envs.criteria import Criterion, VehicleSnapshot
from cadre_tpu.envs.events import TrafficEvent, TrafficEventType

GREEN = "green"
YELLOW = "yellow"
RED = "red"

# forced cycle times (atomic_criteria.py:1869-1871)
GREEN_TIME = 5.0
RED_TIME = 0.5
YELLOW_TIME = 3.0
CYCLE = GREEN_TIME + YELLOW_TIME + RED_TIME

# light-state class ids for the perception light head (4 classes,
# Config/auto_danet.py light_state head); 0 = no light visible
LIGHT_CLASSES = {"none": 0, GREEN: 1, YELLOW: 2, RED: 3}

# ego bounding-box half-length (lincoln.mkz2017 extent.x)
DEFAULT_VEH_EXTENT = 2.45


@dataclasses.dataclass
class StopLine:
    """One lane entry at a signalized junction: the stop-line waypoint.

    Mirrors the discretized trigger-volume waypoints of
    RunningRedLightTest.get_traffic_light_waypoints (advanced to the
    junction entry), reduced to what the geometric test consumes.
    """

    pos: np.ndarray               # stop-line lane waypoint [2]
    dir: np.ndarray               # unit lane direction [2]
    lane_width: float = 3.5


@dataclasses.dataclass
class TrafficLightInfo:
    uid: int
    center: np.ndarray            # trigger-volume center [2]
    stop_lines: List[StopLine]
    state: str = GREEN
    phase: float = 0.0            # cycle phase offset (sim state machine)
    frozen: Optional[str] = None  # forced state (update_light_states)
    actor: Any = None             # backing simulator actor, if any
    # per-light (green, yellow, red) override of the forced cycle — used by
    # data collection to balance light-state labels (red is 0.5 s of the
    # 8.5 s RL-parity cycle, starving the light head's red class)
    times: Optional[tuple] = None

    def state_at(self, t: float) -> str:
        """Sim-side cycle green -> yellow -> red with the forced times."""
        if self.frozen is not None:
            return self.frozen
        g, y, _ = self.times or (GREEN_TIME, YELLOW_TIME, RED_TIME)
        u = (t + self.phase) % (sum(self.times) if self.times else CYCLE)
        if u < g:
            return GREEN
        if u < g + y:
            return YELLOW
        return RED


@dataclasses.dataclass
class StopSignInfo:
    uid: int
    center: np.ndarray            # trigger-volume center [2]
    extent: np.ndarray            # bbox half-extents [2] in the sign frame
    yaw: float = 0.0              # bbox orientation (degrees)


_FREEZE_TIMEOUT = 1e9


def force_actor_state(light: TrafficLightInfo, state: str,
                      freeze: bool = False) -> None:
    """Push a forced state to the backing simulator light, the reference
    way: set_state(enum) + huge phase times to freeze
    (carla_data_provider.py:393-397). No-op for map-only sim lights."""
    actor = light.actor
    if actor is None:
        return
    try:
        import importlib

        carla = importlib.import_module("carla")
        actor.set_state(getattr(carla.TrafficLightState,
                                state.capitalize()))
        if freeze:
            actor.set_green_time(_FREEZE_TIMEOUT)
            actor.set_red_time(_FREEZE_TIMEOUT)
            actor.set_yellow_time(_FREEZE_TIMEOUT)
    except (ImportError, RuntimeError, AttributeError):
        pass


def update_light_states(ego_light: TrafficLightInfo,
                        annotations: dict, states: dict,
                        freeze: bool = False) -> list:
    """Force light states by group role (carla_data_provider.py:369-414).

    `annotations` maps 'ref'/'opposite'/'left'/'right' -> [TrafficLightInfo];
    `states` maps 'ego' or a role -> state string. Returns reset params for
    `reset_lights`. Server-backed lights are forced on the simulator too.
    """
    reset_params = []
    for role, state in states.items():
        lights = [ego_light] if role == "ego" else annotations.get(role, [])
        for light in lights:
            prev_times = None
            if light.actor is not None:
                try:
                    prev_times = (light.actor.get_green_time(),
                                  light.actor.get_red_time(),
                                  light.actor.get_yellow_time())
                except (RuntimeError, AttributeError):
                    prev_times = None
            reset_params.append({"light": light, "state": light.state,
                                 "frozen": light.frozen,
                                 "times": prev_times})
            light.state = state
            if freeze:
                light.frozen = state
            force_actor_state(light, state, freeze=freeze)
    return reset_params


def reset_lights(reset_params: list) -> None:
    for p in reset_params:
        light = p["light"]
        light.state = p["state"]
        light.frozen = p["frozen"]
        force_actor_state(light, p["state"])
        if p.get("times") and light.actor is not None:
            try:
                g, r, y = p["times"]
                light.actor.set_green_time(g)
                light.actor.set_red_time(r)
                light.actor.set_yellow_time(y)
            except (RuntimeError, AttributeError):
                pass


def annotate_light_group(ref: TrafficLightInfo,
                         group: Sequence[TrafficLightInfo]) -> dict:
    """Classify a junction's lights relative to `ref` by approach heading
    (carla_data_provider.py:309-342): yaw diff >330 skip, >225 right,
    >135 opposite, >30 left.

    Deliberate reference parity: a SAME-direction head that is not `ref`
    itself (diff <= 30 or > 330) joins no group — the reference's
    annotate_trafficlight_in_group drops it identically (only id == ref.id
    lands in 'ref'), so dual-lane parallel heads are never force-set
    there either."""
    out = {"ref": [ref], "opposite": [], "left": [], "right": []}
    if not ref.stop_lines:
        return out
    ref_yaw = math.degrees(math.atan2(*ref.stop_lines[0].dir[::-1]))
    for tl in group:
        if tl.uid == ref.uid or not tl.stop_lines:
            continue
        yaw = math.degrees(math.atan2(*tl.stop_lines[0].dir[::-1]))
        diff = (yaw - ref_yaw) % 360
        if diff > 330:
            continue
        elif diff > 225:
            out["right"].append(tl)
        elif diff > 135:
            out["opposite"].append(tl)
        elif diff > 30:
            out["left"].append(tl)
    return out


def _segments_intersect(p1, p2, q1, q2) -> bool:
    """2D segment intersection (the shapely LineString.intersection test,
    atomic_criteria.py:1878-1886) via orientation signs."""

    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if abs(v) < 1e-12 else (1 if v > 0 else -1)

    o1, o2 = orient(p1, p2, q1), orient(p1, p2, q2)
    o3, o4 = orient(q1, q2, p1), orient(q1, q2, p2)
    if o1 != o2 and o3 != o4:
        return True
    return False


def _snap_forward(snap: VehicleSnapshot) -> np.ndarray:
    if snap.forward is not None:
        return np.asarray(snap.forward, float)
    yaw = math.radians(snap.yaw)
    return np.array([math.cos(yaw), math.sin(yaw)])


class RunningRedLightCriterion(Criterion):
    """Geometric red-light test (atomic_criteria.py:1836-2075).

    Per tick: for each light whose trigger center is within DISTANCE_LIGHT
    of the ego and whose stop line serves the ego's lane/direction, emit
    APPROACH_LIGHT (with distance/state payload) until the ego's tail
    segment crosses the stop line; if the light is red when the tail
    segment crosses the line centered on the trigger volume, emit one
    TRAFFIC_LIGHT_INFRACTION for that light (debounced via
    `_last_red_light_id`, exactly like the reference).
    """

    name = "RunningRedLightTest"
    DISTANCE_LIGHT = 10.0                      # atomic_criteria.py:1846
    APPROACH_LIGHT = 1.5 * DISTANCE_LIGHT

    def __init__(self, lights: Sequence[TrafficLightInfo],
                 veh_extent: float = DEFAULT_VEH_EXTENT):
        super().__init__()
        self._lights = list(lights)
        self._ext = veh_extent
        self._last_red_light_id: Optional[int] = None
        self._last_light_id: Optional[int] = None

    def _lane_match(self, sl: StopLine, tail_far: np.ndarray,
                    fwd: np.ndarray) -> bool:
        """Same-lane/direction gate. The reference compares map road/lane
        ids of the tail waypoint; without a map we gate on direction
        agreement and lateral offset from the lane axis."""
        if float(fwd @ sl.dir) <= 0:
            return False
        rel = tail_far - sl.pos
        lateral = abs(float(rel[0] * sl.dir[1] - rel[1] * sl.dir[0]))
        return lateral <= 0.8 * sl.lane_width

    def update(self, snap: VehicleSnapshot) -> None:
        pos = np.asarray(snap.pos, float)
        fwd = _snap_forward(snap)
        tail_close = pos - 0.8 * self._ext * fwd
        tail_far = pos - (self._ext + 1.0) * fwd

        for light in self._lights:
            if self._last_red_light_id == light.uid:
                continue
            center = np.asarray(light.center, float)
            d_center = float(np.hypot(*(center - pos)))
            if d_center > self.DISTANCE_LIGHT:
                continue

            for sl in light.stop_lines:
                if not self._lane_match(sl, tail_far, fwd):
                    continue
                perp = np.array([-sl.dir[1], sl.dir[0]])
                half = 0.4 * sl.lane_width
                # approach phase: stop line at the lane waypoint
                lft, rgt = sl.pos + half * perp, sl.pos - half * perp
                if _segments_intersect(tail_close, tail_far, lft, rgt):
                    self._last_light_id = light.uid
                    break
                if light.uid != self._last_light_id:
                    self.list_traffic_events.append(TrafficEvent(
                        TrafficEventType.APPROACH_LIGHT,
                        f"Approaching light {light.uid} ({light.state})",
                        {"distance": d_center, "id": light.uid,
                         "state": light.state}))

            if light.state != RED:
                continue
            for sl in light.stop_lines:
                if not self._lane_match(sl, tail_far, fwd):
                    continue
                perp = np.array([-sl.dir[1], sl.dir[0]])
                half = 0.4 * sl.lane_width
                # infraction phase: line centered on the trigger volume
                # (the reference's `location_wp = center_loc` change)
                lft, rgt = center + half * perp, center - half * perp
                if _segments_intersect(tail_close, tail_far, lft, rgt):
                    self.test_status = "FAILURE"
                    self.actual_value += 1
                    self.list_traffic_events.append(TrafficEvent(
                        TrafficEventType.TRAFFIC_LIGHT_INFRACTION,
                        f"Agent ran a red light {light.uid} at "
                        f"(x={center[0]:.3f}, y={center[1]:.3f})",
                        {"id": light.uid, "x": float(center[0]),
                         "y": float(center[1])}))
                    self._last_red_light_id = light.uid
                    break


def _point_inside_bb(point: np.ndarray, center: np.ndarray,
                     extent: np.ndarray, yaw_deg: float) -> bool:
    """Oriented-bbox containment (RunningStopTest.point_inside_boundingbox,
    generalized to the box yaw)."""
    c, s = math.cos(math.radians(yaw_deg)), math.sin(math.radians(yaw_deg))
    rel = np.asarray(point, float) - np.asarray(center, float)
    local = np.array([c * rel[0] + s * rel[1], -s * rel[0] + c * rel[1]])
    return bool(abs(local[0]) < extent[0] and abs(local[1]) < extent[1])


class RunningStopCriterion(Criterion):
    """Stop-sign state machine (atomic_criteria.py:2076+).

    scan -> (affected when ego or its forward horizon enters the trigger
    box) -> require speed < SPEED_THRESHOLD before leaving the influence
    region, else STOP_INFRACTION. The reference walks map waypoints ahead
    of the actor; without a map the horizon is sampled along the ego's
    forward ray at WAYPOINT_STEP intervals.
    """

    name = "RunningStopTest"
    PROXIMITY_THRESHOLD = 50.0
    SPEED_THRESHOLD = 0.1
    WAYPOINT_STEP = 1.0
    HORIZON_STEPS = 20

    def __init__(self, stop_signs: Sequence[StopSignInfo]):
        super().__init__()
        self._signs = list(stop_signs)
        self._target: Optional[StopSignInfo] = None
        self._stop_completed = False
        self._affected = False

    def _is_affected(self, sign: StopSignInfo, pos: np.ndarray,
                     fwd: np.ndarray) -> bool:
        if float(np.hypot(*(sign.center - pos))) > self.PROXIMITY_THRESHOLD:
            return False
        for k in range(self.HORIZON_STEPS + 1):
            p = pos + k * self.WAYPOINT_STEP * fwd
            if _point_inside_bb(p, sign.center, sign.extent, sign.yaw):
                return True
        return False

    def update(self, snap: VehicleSnapshot) -> None:
        pos = np.asarray(snap.pos, float)
        fwd = _snap_forward(snap)

        if self._target is None:
            for sign in self._signs:
                if self._is_affected(sign, pos, fwd):
                    self._target = sign
                    self._stop_completed = False
                    self._affected = False
                    break
            return

        if not self._stop_completed and snap.speed < self.SPEED_THRESHOLD:
            self._stop_completed = True
        if not self._affected and _point_inside_bb(
                pos, self._target.center, self._target.extent,
                self._target.yaw):
            self._affected = True

        if not self._is_affected(self._target, pos, fwd):
            # left the influence region
            if self._affected and not self._stop_completed:
                self.test_status = "FAILURE"
                self.actual_value += 1
                c = self._target.center
                self.list_traffic_events.append(TrafficEvent(
                    TrafficEventType.STOP_INFRACTION,
                    f"Agent ran a stop with id={self._target.uid} at "
                    f"(x={c[0]:.3f}, y={c[1]:.3f})",
                    {"id": self._target.uid, "x": float(c[0]),
                     "y": float(c[1])}))
            self._target = None
            self._stop_completed = False
            self._affected = False


def lights_at_route_corners(keypoints: np.ndarray, dense: np.ndarray,
                            rng: np.random.RandomState,
                            setback: float = 8.0,
                            lane_width: float = 3.5,
                            min_turn_deg: float = 30.0
                            ) -> List[TrafficLightInfo]:
    """Synthesize junction traffic lights for the kinematic sim: one light
    at each interior route keypoint where the heading changes by more than
    `min_turn_deg`, with the stop line on the route `setback` meters before
    the corner and a random cycle phase."""
    lights: List[TrafficLightInfo] = []
    kp = np.asarray(keypoints, float)
    for i in range(1, len(kp) - 1):
        d_in = kp[i] - kp[i - 1]
        d_out = kp[i + 1] - kp[i]
        n_in = float(np.hypot(*d_in))
        n_out = float(np.hypot(*d_out))
        if n_in < 1e-6 or n_out < 1e-6:
            continue
        cosang = float(np.clip((d_in @ d_out) / (n_in * n_out), -1, 1))
        if math.degrees(math.acos(cosang)) < min_turn_deg:
            continue
        u_in = d_in / n_in
        stop_pos = kp[i] - u_in * min(setback, 0.7 * n_in)
        sl = StopLine(pos=stop_pos, dir=u_in, lane_width=lane_width)
        lights.append(TrafficLightInfo(
            uid=len(lights) + 1, center=stop_pos.copy(), stop_lines=[sl],
            phase=float(rng.uniform(0, CYCLE))))
    return lights


def nearest_light_ahead(lights: Sequence[TrafficLightInfo],
                        pos: np.ndarray, fwd: np.ndarray,
                        max_dist: float = 25.0):
    """(state_class, distance) of the nearest light inside the ego camera's
    90-degree frustum — ground truth for the perception light head. Returns
    (0, -1.0) when no light is visible.

    The frustum test (forward >= 1.5 m and |lateral| <= forward, matching
    the synthetic camera's FOV and near plane) keeps the labels consistent
    with what the camera can actually see: a light 80 degrees off-axis is
    never rendered, and labeling it poisons the light head with
    unlearnable targets. This also approximates CARLA's "affecting light"
    semantics (the light governing the ego's lane is ahead of the ego by
    construction)."""
    pos = np.asarray(pos, float)
    f = np.asarray(fwd, float)
    f = f / max(float(np.hypot(*f)), 1e-9)
    left = np.array([-f[1], f[0]])
    best, best_d = None, max_dist
    for light in lights:
        rel = np.asarray(light.center, float) - pos
        d = float(np.hypot(*rel))
        xf = float(rel @ f)
        if d > best_d or xf < 1.5 or abs(float(rel @ left)) > xf:
            continue
        best, best_d = light, d
    if best is None:
        return LIGHT_CLASSES["none"], -1.0
    return LIGHT_CLASSES[best.state], best_d
