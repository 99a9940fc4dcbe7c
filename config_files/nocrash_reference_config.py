"""NoCrash-with-scenarios over the REFERENCE data files.

The checked-in pointer config that runs the reference's actual route XMLs
and per-route scenario JSONs end-to-end (config_files/agent_config.py:81-87
points at the same files relative to the reference checkout). Point
`reference_root` at a BIT-MCS/Cadre checkout; the defaults match the
read-only mount used in CI (tests/test_nocrash_reference_data.py drives an
episode over these files).
"""
import os

reference_root = os.environ.get("CADRE_REFERENCE_ROOT", "/root/reference")

_route_dir = os.path.join(reference_root, "nocrash_route")
_scen_dir = os.path.join(reference_root, "nocrash_scenarios")

rollout_cfg = dict(
    num_steps=200,
    seq_length=8,
    gamma=0.99,
    tau=0.95,
    mini_batch_num=2,
)

train_cfg = dict(
    max_episode=3000,
    ppo_epoch=4,
    use_adv_norm=True,
    save_interval=100,
    log_interval=10,
)

env_cfg = dict(
    frame_rate=10,
    vehicle_block_time=400,
    training=True,
    route_indexer="priority",
    num_processes=4,
    town=["Town01"] * 4,
    amount=[150, 0],
    routes=[
        os.path.join(_route_dir, "Nocrash_follow_lane_turn_route.xml"),
        os.path.join(_route_dir, "Nocrash_right_turn_route.xml"),
        os.path.join(_route_dir, "Nocrash_left_turn_route.xml"),
        os.path.join(_route_dir, "Nocrash_straight_turn_route.xml"),
    ],
    scenarios=[
        os.path.join(_scen_dir, "follow_lane_nocrash_scenarios", "Town01"),
        os.path.join(_scen_dir, "straight_nocrash_scenarios", "Town01"),
        os.path.join(_scen_dir, "straight_nocrash_scenarios", "Town01"),
        os.path.join(_scen_dir, "straight_nocrash_scenarios", "Town01"),
    ],
)

eval_cfg = dict(
    eval_episode=25,
    routes=[os.path.join(_route_dir, "eval_routes", "Nocrash_Town01.xml")],
    scenarios=[os.path.join(reference_root, "nocrash_route",
                            "empty_scenario.json")],
    amount=[20, 50],
)
