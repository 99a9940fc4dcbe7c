"""Training configuration file (Config.fromfile format).

Mirrors the reference's config_files/agent_config.py contract: declares
rollout_cfg / agent_cfg / train_cfg / env_cfg dicts plus the action LUTs.
Loaded with `cadre_tpu.utils.config.Config.fromfile`; values here are the
production NoCrash training setup.
"""

# 3-bin throttle LUT: index -> (throttle, brake): coast / brake / throttle
THROTTLE_CONTROL = {0: [0, 0], 1: [0, 1], 2: [0.6, 0]}


def _steer_lut():
    """33 steering bins in sixteenths: indices 0-16 sweep -8/16..8/16,
    then +k/-k pairs widen to +-16/16."""
    lut = {i: (i - 8) / 16.0 for i in range(17)}
    idx = 17
    for k in range(9, 17):
        lut[idx] = k / 16.0
        lut[idx + 1] = -k / 16.0
        idx += 2
    return lut


STEER_CONTROL = _steer_lut()

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
