"""Evaluation configuration (Config.fromfile format), inheriting training
defaults — the reference's config_files/eval_agent_config.py contract:
sequential indexer, NoCrash eval traffic (20 vehicles, 50 walkers),
6-checkpoint ensemble, 25 episodes."""

_base_ = "agent_config.py"

eval_cfg = dict(
    eval_episode=25,
    load_episode=[2400, 2500, 2600, 2700, 2800, 2900],
    brake_threshold=0.5,
)

env_cfg = dict(
    training=False,
    route_indexer="sequential",
    amount=[20, 50],
    vehicle_block_time=800,
    routes=["routes/nocrash_eval.xml"],
    scenarios=["routes/scenarios.json"],
)
