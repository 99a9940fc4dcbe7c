"""Route-figure rasterization, deviation distance, heading error, and the
turn-detection state machine.

Contracts (env_wrapper.py):
  - _draw_route (:240-344): render the next <=50m of route as a width-15
    polyline on a 256x144 canvas in the ego frame rotated by compass+pi/2;
    track turn segments by axis-change of consecutive waypoints; compute the
    perpendicular distance from the ego to the first route segment.
  - get_theta (:484-561): heading error between the vehicle forward vector
    (from IMU yaw) and the route vector via arccos of the normalized dot
    product, with the route_len==2 supplementary-angle special case.

The rasterizer here is a vectorized numpy distance-to-segment ribbon (the
reference uses PIL width-15 lines; the ribbon is behaviorally equivalent —
the encoder consumes it max-normalized).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import numpy as np

SIZE_X = 144   # canvas width (ego x axis)
SIZE_Y = 256   # canvas height (ego y axis)
PIXELS_PER_METER = 3.66
LINE_WIDTH = 15.0


@dataclasses.dataclass
class TurnState:
    """Turn-detection state carried across steps (env_wrapper.py:302-343)."""

    in_turn: bool = False
    turn_first_node: Optional[np.ndarray] = None
    turn_last_node: Optional[np.ndarray] = None
    first_direction: int = 0
    last_direction: int = 0
    pre_theta: float = 0.0


def _rotation(compass: float) -> np.ndarray:
    c = 0.0 if math.isnan(compass) else compass
    c = c + np.pi / 2
    return np.array([[np.cos(c), -np.sin(c)], [np.sin(c), np.cos(c)]])


def rasterize_polyline(points_px: np.ndarray, height: int = SIZE_Y,
                       width: int = SIZE_X,
                       line_width: float = LINE_WIDTH) -> np.ndarray:
    """Distance-to-segment ribbon raster: uint8 {0,255} [height, width].

    points_px: [N,2] (x, y) pixel coordinates. Each segment only evaluates
    pixels inside its padded bounding box (segments are ~4 px long, so this
    is ~100x cheaper than a full-canvas pass — the rasterizer is on the hot
    10 Hz env path).
    """
    fig = np.zeros((height, width), np.uint8)
    pts = np.asarray(points_px, np.float64)
    if len(pts) < 2:
        return fig

    # native fast path (cadre_tpu/runtime/raster.cpp)
    from cadre_tpu.runtime.native_raster import rasterize_polyline_native

    native = rasterize_polyline_native(pts, height, width, line_width)
    if native is not None:
        return native

    half = line_width / 2.0

    # sample centers along the whole polyline every ~1.5 px
    seg = np.diff(pts, axis=0)
    seg_len = np.hypot(seg[:, 0], seg[:, 1])
    centers = [pts[:1]]
    for a, d, l in zip(pts[:-1], seg, seg_len):
        n = max(1, int(l / 1.5))
        ts = (np.arange(1, n + 1) / n)[:, None]
        centers.append(a + ts * d)
    c = np.concatenate(centers)

    # stamp a precomputed disk at each center
    r = int(math.ceil(half))
    dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
    disk = (dx * dx + dy * dy) <= half * half
    offs = np.stack([dx[disk], dy[disk]], axis=-1)  # [K, 2] (x, y)
    pix = np.rint(c[:, None, :] + offs[None, :, :]).astype(np.int64)
    pix = pix.reshape(-1, 2)
    valid = ((pix[:, 0] >= 0) & (pix[:, 0] < width)
             & (pix[:, 1] >= 0) & (pix[:, 1] < height))
    pix = pix[valid]
    fig[pix[:, 1], pix[:, 0]] = 255
    return fig


def ego_frame_px(points: Sequence[np.ndarray], pos: np.ndarray,
                 compass: float,
                 pixels_per_meter: float = PIXELS_PER_METER) -> np.ndarray:
    """World/GPS-meter points -> ego-frame pixel coords centered on canvas."""
    r = _rotation(compass)
    pts = np.asarray(points, np.float64).reshape(-1, 2)
    out = pixels_per_meter * ((pts - pos) @ r)  # (R.T @ v) == v @ R
    out[:, 0] += SIZE_X / 2
    out[:, 1] += SIZE_Y / 2
    return out


def perpendicular_distance(route_list: Sequence[np.ndarray],
                           pos: np.ndarray) -> float:
    """Ego distance to the first distinct route segment (env_wrapper:287-296)."""
    p0 = np.asarray(route_list[0], np.float64)
    for i in range(1, len(route_list)):
        cur = np.asarray(route_list[i], np.float64)
        seg = cur - p0
        norm = math.hypot(seg[0], seg[1])
        if norm > 1e-3:
            d = abs((cur[1] - p0[1]) * (pos[0] - p0[0])
                    - (cur[0] - p0[0]) * (pos[1] - p0[1])) / norm
            return 0.0 if (math.isinf(d) or math.isnan(d)) else d
    return 0.0


# Synthetic-world OutsideRouteLanesTest analog (atomic_criteria.py:1034+).
# The dense route polyline is the EGO LANE centerline of a two-lane road
# (oncoming lane to the left, right-hand traffic). "Outside driving lanes"
# means past the far edge of the oncoming lane on the left, or past the ego
# lane's own edge on the right — each padded by the reference's
# ALLOWED_OUT_DISTANCE shoulder (1.3 m). The reference's wrong-lane state
# machine needs road/lane ids and is meaningless without map topology; the
# geometric outside test is the part the synthetic world can express.
LANE_WIDTH = 3.5
ALLOWED_OUT_DISTANCE = 1.3          # atomic_criteria.py:1045
OUT_LEFT = 1.5 * LANE_WIDTH + ALLOWED_OUT_DISTANCE    # 6.55 m
OUT_RIGHT = 0.5 * LANE_WIDTH + ALLOWED_OUT_DISTANCE   # 3.05 m


def signed_route_lateral(dense_route: np.ndarray, pos: np.ndarray) -> float:
    """Signed lateral offset of `pos` from the nearest dense-route segment:
    positive to the LEFT of the direction of travel (toward the oncoming
    lane)."""
    pts = np.asarray(dense_route, np.float64)
    if len(pts) < 2:
        return 0.0
    p = np.asarray(pos, np.float64)
    i = int(np.argmin(((pts - p) ** 2).sum(axis=-1)))
    i = min(i, len(pts) - 2)
    seg = pts[i + 1] - pts[i]
    n = math.hypot(seg[0], seg[1])
    if n < 1e-6:
        return 0.0
    rel = p - pts[i]
    return float(seg[0] * rel[1] - seg[1] * rel[0]) / n


def outside_route_lanes(lateral: float) -> bool:
    """True when the signed lateral is outside the two-lane road envelope."""
    return lateral > OUT_LEFT or lateral < -OUT_RIGHT


def heading_error(far_node: Optional[np.ndarray], near_node: np.ndarray,
                  pos: np.ndarray, forward: np.ndarray, route_len: int,
                  state: TurnState, compass: float) -> Tuple[float, float]:
    """(theta, distance-to-near-node) (env_wrapper.py:484-561).

    `forward` is the ego's unit heading in the same coordinate space as the
    route (the reference derives it from IMU yaw re-projected through GPS,
    env_wrapper.py:506-520 — net effect is exactly this vector); theta is
    the arccos angle between forward and (far_node - ego) with the
    reference's two-waypoint supplementary-angle correction.
    """
    if far_node is None:
        return 0.0, 0.0
    distance = float(np.hypot(*(np.asarray(near_node) - pos)))

    vector1 = np.asarray(forward, np.float64)
    vector2 = np.asarray(far_node) - pos
    n1 = math.hypot(*vector1)
    n2 = math.hypot(*vector2)
    if n1 < 1e-12 or n2 < 1e-12:
        theta = state.pre_theta
    else:
        cosang = float(vector1 @ vector2) / (n1 * n2)
        cosang = max(-1.0, min(1.0, cosang))
        theta = math.acos(cosang)
        if route_len == 2:
            r = _rotation(compass)
            _, y4 = PIXELS_PER_METER * (r.T @ vector2)
            if y4 > 0:
                theta = math.pi - theta
    state.pre_theta = theta
    if distance < 0.5:
        distance = 0.0
    if math.isnan(theta):
        return 0.0, distance
    return theta, distance


def update_turn_state(state: TurnState, route_list: Sequence[np.ndarray],
                      pos: np.ndarray) -> TurnState:
    """Axis-change turn detector (env_wrapper.py:302-343).

    Consecutive waypoints moving mostly along x then mostly along y (or vice
    versa) bracket a turn; `in_turn` is held while the ego is within
    max(corner radius)+6m of the inferred corner point.
    """
    turn_pre = np.asarray(route_list[0], np.float64)
    for i in range(1, len(route_list)):
        cur = np.asarray(route_list[i], np.float64)
        if not state.in_turn:
            dx = abs(cur[0] - turn_pre[0])
            dy = abs(cur[1] - turn_pre[1])
            if dx < 1 or dy < 1:
                continue
            direction = 0 if dx < dy else 1
            if state.turn_first_node is None:
                state.first_direction = direction
                state.turn_first_node = cur
            else:
                state.last_direction = direction
                state.turn_last_node = cur
            turn_pre = cur

    if state.turn_first_node is not None and state.turn_last_node is not None:
        if state.first_direction == 0:
            middle = np.array([state.turn_last_node[0],
                               state.turn_first_node[1]])
        else:
            middle = np.array([state.turn_first_node[0],
                               state.turn_last_node[1]])
        turn_dis = float(np.hypot(*(middle - pos)))
        max_dis = max(float(np.hypot(*(middle - state.turn_first_node))),
                      float(np.hypot(*(middle - state.turn_last_node))))
        if turn_dis < max_dis + 6:
            state.in_turn = True
        elif state.in_turn:
            state.in_turn = False
            state.turn_first_node = None
            state.turn_last_node = None
            state.first_direction = 0
            state.last_direction = 0
    return state


def draw_route(route_list: Sequence[np.ndarray], pos: np.ndarray,
               compass: float, forward: np.ndarray, state: TurnState
               ) -> Tuple[np.ndarray, float, float, TurnState]:
    """Full _draw_route equivalent.

    `forward`: ego unit heading in route-coordinate space.
    Returns (route_fig [256,144] uint8, deviation_distance, theta, state).
    """
    px = ego_frame_px(route_list, pos, compass)
    fig = rasterize_polyline(px)

    # first node distinct from route_list[0] drives the heading error
    far_node = None
    p0 = np.asarray(route_list[0])
    for i in range(1, len(route_list)):
        p = np.asarray(route_list[i])
        if abs(p[0] - p0[0]) + abs(p[1] - p0[1]) > 1e-3:
            far_node = p
            break

    pep_dis = perpendicular_distance(route_list, pos)
    theta, distance = heading_error(far_node, p0, pos, forward,
                                    len(route_list), state, compass)
    if len(route_list) == 2:
        distance = pep_dis
    state = update_turn_state(state, route_list, pos)
    return fig, distance, theta, state
