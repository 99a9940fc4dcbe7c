"""Map-aware dense route tracing (cadre_tpu/envs/map_router.py) against the
grid-town stub map — the dense-trace branch of carla_env._trace_route
(route_manipulation.py:132-169) exercised in CI, with routes that actually
turn at junctions (VERDICT r3 item 7)."""
import sys

import numpy as np
import pytest

from cadre_tpu.envs.map_router import MapRouter
from cadre_tpu.envs.road_option import RoadOption
from tests import carla_stub
from tests.carla_stub import GridTownMap, Location


def _pts(route):
    return np.asarray([[wp.transform.location.x, wp.transform.location.y]
                       for wp, _ in route])


def test_grid_topology_builds():
    m = GridTownMap()
    topo = m.get_topology()
    assert len(topo) > 20
    # every edge densifies: begin.next() walks toward the end waypoint
    begin, end = topo[0]
    nxt = begin.next(1.0)
    assert nxt and nxt[0].transform.location.distance(
        begin.transform.location) == pytest.approx(1.0, abs=0.1)


def test_trace_turns_right_at_junction():
    """Eastbound approach -> +y exit. CARLA's frame is left-handed (+y to
    the RIGHT of +x): the eastbound lane of road y=0 sits at y=+1.75, the
    +y-bound lane of road x=0 at x=-1.75, and the turn is a RIGHT
    (Nocrash_right_turn_route.xml: yaw_out - yaw_in = +90). The dense
    trace must round the junction corner, not the straight chord."""
    m = GridTownMap()
    router = MapRouter(m, 1.0)
    route = router.trace_route(Location(-40.0, 1.75), Location(-1.75, 60.0))
    pts = _pts(route)
    gaps = np.hypot(*np.diff(pts, axis=0).T)
    assert gaps.max() < 3.0, "trace not dense"
    opts = {opt for _, opt in route}
    assert RoadOption.RIGHT in opts
    # rounds the corner: contains points on BOTH approach legs
    on_east_leg = (np.abs(pts[:, 1] - 1.75) < 1.0) & (pts[:, 0] < -10.0)
    on_north_leg = (np.abs(pts[:, 0] + 1.75) < 1.0) & (pts[:, 1] > 10.0)
    assert on_east_leg.any() and on_north_leg.any()
    # ...and never takes the straight chord between them (chord midpoint
    # (-19, 29) is ~25 m from any road)
    chord_mid = np.asarray([-19.0, 29.0])
    assert np.hypot(*(pts - chord_mid).T).min() > 15.0


def test_trace_turns_left_at_junction():
    """Eastbound approach -> -y exit = LEFT in CARLA's left-handed frame
    (Nocrash_left_turn_route.xml: yaw_out - yaw_in = -90). The -y-bound
    lane of road x=0 sits at x=+1.75."""
    m = GridTownMap()
    router = MapRouter(m, 1.0)
    route = router.trace_route(Location(-40.0, 1.75), Location(1.75, -60.0))
    opts = {opt for _, opt in route}
    assert RoadOption.LEFT in opts
    assert RoadOption.RIGHT not in opts


def test_trace_straight_through_junction():
    m = GridTownMap()
    router = MapRouter(m, 1.0)
    route = router.trace_route(Location(-40.0, 1.75),
                               Location(60.0, 1.75))
    opts = [opt for _, opt in route]
    assert RoadOption.STRAIGHT in opts      # junction crossing
    assert RoadOption.LEFT not in opts and RoadOption.RIGHT not in opts
    pts = _pts(route)
    assert np.abs(pts[:, 1] - 1.75).max() < 1.0   # stays on the lane


def test_carla_env_dense_branch_turns(tmp_path, monkeypatch):
    """CarlaDrivingEnv reset over GridTownMap runs the MAP-AWARE branch:
    the interpolated route turns at the junction and the planner emits a
    non-LANEFOLLOW command for it."""
    mod = carla_stub.make_module()
    monkeypatch.setitem(sys.modules, "carla", mod)
    world = carla_stub.World("Town01", map_obj=GridTownMap())
    carla_stub.Client._worlds = {8010: world}

    from cadre_tpu.envs.carla_env import CarlaDrivingEnv

    wps = "".join(f'<waypoint x="{x}" y="{y}" z="0"/>'
                  for x, y in [(-40.0, 1.75), (-1.75, 60.0)])
    routes = tmp_path / "routes.xml"
    routes.write_text(
        f'<routes><route id="0" map="Town01">{wps}</route></routes>')
    env = CarlaDrivingEnv(port=8010, routes_file=str(routes),
                          training=True, client_timeout=5.0)
    try:
        env.reset()
        pts = np.asarray([[tf.location.x, tf.location.y]
                          for tf, _ in env._route_transforms])
        opts = {opt for _, opt in env._route_transforms}
        assert RoadOption.RIGHT in opts   # east -> +y = RIGHT (CARLA frame)
        on_east = (np.abs(pts[:, 1] - 1.75) < 1.0) & (pts[:, 0] < -10.0)
        on_north = (np.abs(pts[:, 0] + 1.75) < 1.0) & (pts[:, 1] > 10.0)
        assert on_east.any() and on_north.any()
    finally:
        env.close()
    carla_stub.Client._worlds = {}


def test_trace_from_dead_end_stub_falls_back():
    """Grid boundary-extension lanes are dead-end stubs (no successors,
    no U-turns). A query point whose NEAREST lane point sits on such a
    stub must still route: trace_route falls back through next-nearest
    anchor candidates (the Town02 NoCrash eval regression — keypoint near
    the boundary junction projected onto the northbound extension)."""
    m = GridTownMap(xs=(0.0, 120.0), ys=(0.0, 120.0))
    router = MapRouter(m, 1.0)
    # (-2.5, 126): past the last horizontal road, nearest the x=0 road's
    # outbound (+y) extension stub (lane x=-1.75 in the CARLA frame,
    # y>=128)
    route = router.trace_route(Location(-2.5, 126.0), Location(60.0, 1.75))
    pts = _pts(route)
    assert len(pts) > 50
    gaps = np.hypot(*np.diff(pts, axis=0).T)
    assert gaps.max() < 3.0, "trace not dense"
    assert np.hypot(pts[0, 0] - 2.5, pts[0, 1] - 126.0) < 20.0
    assert np.hypot(pts[-1, 0] - 60.0, pts[-1, 1] + 1.75) < 5.0


def test_nocrash_town02_eval_routes_all_trace():
    """Every route in the reference Town02 NoCrash eval XML traces densely
    over the approximate town grid (the exact input that hit the dead-end
    stub before the anchor fallback)."""
    import os

    from cadre_tpu.envs.route_parser import parse_routes_file
    from cadre_tpu.envs.town_maps import town_map, trace_dense_route

    xml = "/root/reference/nocrash_route/eval_routes/Nocrash_Town02.xml"
    if not os.path.exists(xml):
        pytest.skip("reference data not mounted")
    tmap = town_map("Town02")
    for cfg in parse_routes_file(xml):
        kp = np.asarray([w.xy for w in cfg.trajectory])
        dense = trace_dense_route(tmap, kp)
        assert len(dense) >= 30, cfg.name
        gaps = np.hypot(*np.diff(dense, axis=0).T)
        assert gaps.max() < 3.0, cfg.name
