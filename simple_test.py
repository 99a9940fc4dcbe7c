"""Smoke test (the reference's `python simple_test.py`): one env + one agent,
scripted throttle pulses, renders the 8-frame RGB strip to a PNG.
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="sim", choices=["sim", "fake", "carla"])
    p.add_argument("--episodes", type=int, default=2)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--out", default="simple_test_frames.png")
    p.add_argument("--small", action="store_true")
    args = p.parse_args()

    from cadre_tpu.configs.danet_config import danet_params
    from cadre_tpu.rl.agent import CadreAgent

    danet_cfg = danet_params() if not args.small else danet_params(
        da_feature_channel=64, inter_att_dims=48, z_dims=32)
    agent = CadreAgent.create(jax.random.PRNGKey(0), danet_cfg=danet_cfg)

    if args.env == "fake":
        from cadre_tpu.envs.fake_env import FakeDrivingEnv

        env = FakeDrivingEnv(episode_length=args.steps)
    else:
        from cadre_tpu.envs.sim_env import SimDrivingEnv

        env = SimDrivingEnv(seed=0)

    tick = env.reset()
    for ep in range(args.episodes):
        for i in range(args.steps):
            out = agent.act(tick, jax.random.PRNGKey(i))
            throttle = 0.6 if (i // 10) % 2 == 0 else 0.0  # scripted pulses
            tick, rewards, done, info = env.step([0.0, throttle, 0.0])
            if done:
                tick = env.reset()
                break
        print(f"episode {ep}: speed={tick.get('speed', 0):.2f} "
              f"rewards={np.asarray(rewards).round(2).tolist()}")

    # save the frame strip
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        frames = tick["rgb"]
        fig, axes = plt.subplots(1, len(frames),
                                 figsize=(2.2 * len(frames), 2))
        for ax, frame in zip(np.atleast_1d(axes), frames):
            ax.imshow(frame)
            ax.axis("off")
        fig.savefig(args.out, bbox_inches="tight")
        print(f"wrote {args.out}")
    except Exception as e:  # matplotlib optional
        print(f"(frame strip not rendered: {e})")


if __name__ == "__main__":
    main()
