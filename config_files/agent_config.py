"""Training configuration file (Config.fromfile format).

Mirrors the reference's config_files/agent_config.py contract: declares
rollout_cfg / agent_cfg / train_cfg / env_cfg dicts plus the action LUTs.
Loaded with `cadre_tpu.utils.config.Config.fromfile`; values here are the
production NoCrash training setup.
"""

# 3-bin throttle LUT: index -> (throttle, brake)
THROTTLE_CONTROL = {0: [0, 0], 1: [0, 1], 2: [0.6, 0]}

# 33-bin steering LUT: index -> steer in [-1, 1]
STEER_CONTROL = {
    0: -8 / 16, 1: -7 / 16, 2: -6 / 16, 3: -5 / 16, 4: -4 / 16,
    5: -3 / 16, 6: -2 / 16, 7: -1 / 16, 8: 0.0, 9: 1 / 16,
    10: 2 / 16, 11: 3 / 16, 12: 4 / 16, 13: 5 / 16, 14: 6 / 16,
    15: 7 / 16, 16: 8 / 16, 17: 9 / 16, 18: -9 / 16, 19: 10 / 16,
    20: -10 / 16, 21: 11 / 16, 22: -11 / 16, 23: 12 / 16, 24: -12 / 16,
    25: 13 / 16, 26: -13 / 16, 27: 14 / 16, 28: -14 / 16, 29: 15 / 16,
    30: -15 / 16, 31: 1.0, 32: -1.0,
}

rollout_cfg = dict(
    num_steps=200,
    mini_batch_num=2,
    feature_dims=512 + 18,
    seq_length=8,
    use_gae=True,
    gamma=0.99,
    tau=0.95,
)

agent_cfg = dict(
    model_cfg=dict(
        use_lstm=True,
        vae_params="CoPM",
        measurement_dim=18,
        num_output=dict(steer=len(STEER_CONTROL),
                        throttle=len(THROTTLE_CONTROL)),
        command_num=4,
        ordinal=False,
    ),
    frame=8,
    ent_coeff=0.01,
    value_coeff=0.1,
    clip_coeff=1.0,
    clip=0.1,
)

train_cfg = dict(
    max_episode=3000,
    max_grad_norm=250,
    use_adv_norm=True,
    ppo_epoch=4,
    lr=3e-4,
    save_interval=100,
    log_interval=10,
)

env_cfg = dict(
    root_path="result",
    frame_rate=10,
    timeout=60,
    client_timeout=60,
    vehicle_block_time=400,
    min_speed=5,
    max_speed=9,
    target_speed=7,
    max_degree=90,
    host="localhost",
    training=True,
    route_indexer="priority",
    num_processes=4,
    port=[8010, 8020, 8030, 8040],
    town=["Town01"] * 4,
    amount=[150, 0],
    routes=[
        "routes/nocrash_follow_lane.xml",
        "routes/nocrash_right_turn.xml",
        "routes/nocrash_left_turn.xml",
        "routes/nocrash_straight.xml",
    ],
    scenarios=["routes/scenarios.json"] * 4,
)
