"""AtRightmostLane port (VERDICT r4 item 8): GridTownMap grows per-road
lane counts + carla.Waypoint.get_right_lane(), and the condition mirrors
atomic_trigger_conditions.py:1253-1291 (SUCCESS iff the right neighbor
exists and is not a Driving lane; RUNNING when there is no neighbor)."""
import numpy as np

from cadre_tpu.envs.scenarios import AtRightmostLane
from cadre_tpu.envs.town_maps import GridTownMap


class _Env:
    def __init__(self, pos):
        self._pos = np.asarray(pos, float)


def test_two_lane_road_right_neighbor_is_driving_then_shoulder():
    m = GridTownMap(xs=(0.0, 200.0), ys=(0.0, 200.0),
                    lanes_per_direction=2)
    # eastbound lanes of road y=0 sit at y=+1.75 (inner) and y=+5.25
    # (outer) in the CARLA frame
    loc = type("L", (), dict(x=60.0, y=1.75, z=0.0))()
    inner = m.get_waypoint(loc)
    assert abs(inner.transform.location.y - 1.75) < 0.3
    right = inner.get_right_lane()
    assert right.lane_type == "Driving"
    assert abs(right.transform.location.y - 5.25) < 0.3
    # the outer lane's right neighbor is the Shoulder
    shoulder = right.get_right_lane()
    assert shoulder.lane_type == "Shoulder"
    assert abs(shoulder.transform.location.y - 8.75) < 0.5


def test_condition_matches_reference_semantics():
    m = GridTownMap(xs=(0.0, 200.0), ys=(0.0, 200.0),
                    lanes_per_direction=2)
    cond = AtRightmostLane("ego", m)
    assert cond(_Env((60.0, 1.75))) is False     # inner lane: not rightmost
    assert cond(_Env((60.0, 5.25))) is True      # outer lane: rightmost


def test_single_lane_road_is_rightmost():
    m = GridTownMap(xs=(0.0, 200.0), ys=(0.0, 200.0))
    cond = AtRightmostLane("ego", m)
    assert cond(_Env((60.0, 1.75))) is True


def test_junction_waypoint_has_no_right_lane():
    m = GridTownMap(xs=(0.0, 200.0), ys=(0.0, 200.0),
                    lanes_per_direction=2)
    loc = type("L", (), dict(x=0.5, y=0.5, z=0.0))()  # junction interior
    wp = m.get_waypoint(loc)
    if wp.is_junction:        # nearest edge may be a connector
        assert wp.get_right_lane() is None


def test_default_single_lane_topology_unchanged():
    """lanes_per_direction=1 must reproduce the pre-change grid (the
    NoCrash tracing + CI stub depend on it)."""
    m1 = GridTownMap()
    assert len([e for e in m1._edges if not e.junction]) == \
        len([e for e in GridTownMap(lanes_per_direction=1)._edges
             if not e.junction])
    wp = m1.get_waypoint(type("L", (), dict(x=60.0, y=1.75, z=0.0))())
    assert wp.get_right_lane().lane_type == "Shoulder"
