"""Representation-quality probe: trained vs random frozen CoPM latents.

The cascade-proof RL experiments (BENCH_r2_cascade*.json) found no
completion gap between a pretrained and a random frozen encoder, in both
the base and the blind-route protocol. This probe localizes the null: it
measures how much task-relevant state is LINEARLY decodable from each
encoder's latent, independent of whether PPO exploits it.

Protocol: roll the expert through SimDrivingEnv (same env family as the
cascade arms), record per-frame (camera+route_fig input, dis, theta,
expert steer, light_state); encode every frame with (a) the cascade-proof
pretrained encoder and (b) a random-init encoder of the same config;
fit ridge regression (closed form) / multinomial logistic (light state)
from latents to targets on a train split; report held-out R^2 / accuracy.

If trained >> random here while RL shows no gap, the encoder carries the
signal and the bottleneck is the RL stage at this training scale — the
cascade premise fails downstream of perception, not inside it.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def collect_frames(n_frames: int, seed: int,
                   route_legs: int = 3,
                   route_leg_len: tuple = (40.0, 90.0)):
    from cadre_tpu.envs.expert import OracleExpert
    from cadre_tpu.envs.sim_env import SimDrivingEnv

    env = SimDrivingEnv(seed=seed, vehicle_num=(6, 6),
                        randomize_weather=True,
                        route_legs=route_legs,
                        route_leg_len=route_leg_len)
    env.seq_length = 2
    expert = OracleExpert()
    rgb, fig, targets = [], [], []
    tick = env.reset()
    stuck = 0
    while len(rgb) < n_frames:
        control = expert.act(env, tick)
        # same stuck guard as perception.data.collect_dataset: don't fill
        # the probe set with thousands of identical stopped frames
        if float(tick.get("speed", 0.0)) < 0.3:
            stuck += 1
            if stuck >= 100:
                stuck = 0
                tick = env.reset()
                continue
            if stuck > 25:
                tick, _, done, _ = env.step(control)
                if done:
                    stuck = 0
                    tick = env.reset()
                continue
        else:
            stuck = 0
        raw_meas = tick["last_measurements"] if "last_measurements" in tick \
            else tick["measurements"][-1]
        rgb.append(np.array(tick["rgb"][-1]))
        fig.append(np.array(tick["route_fig"][-1]))
        targets.append([float(raw_meas[1]),            # dis (normalized /3)
                        float(raw_meas[2]),            # |theta| (normalized)
                        float(control[0]),             # expert steer
                        float(tick.get("light_state", 0))])
        tick, rewards, done, info = env.step(control)
        if done:
            tick = env.reset()
    return (np.stack(rgb), np.stack(fig),
            np.asarray(targets, np.float32))


def encode(variables, cfg, rgb, fig, batch: int = 256):
    import jax
    import jax.numpy as jnp

    from cadre_tpu.models.danet import DANet
    from cadre_tpu.rl.agent import preprocess_obs

    model = DANet(cfg)
    fn = jax.jit(lambda v, x: model.apply(v, x, method=DANet.latent))
    blank = bool(getattr(cfg, "in_route_blank", False))
    zs = []
    for i in range(0, len(rgb), batch):
        x = preprocess_obs(jnp.asarray(rgb[i:i + batch]),
                           jnp.asarray(fig[i:i + batch]),
                           blank_route=blank)
        zs.append(np.asarray(fn(variables, x)))
    return np.concatenate(zs)


def _ridge_fit(a, y, lam):
    return np.linalg.solve(a.T @ a + lam * len(a) * np.eye(a.shape[1]),
                           a.T @ y)


def _r2(y, pred):
    ss_res = ((y - pred) ** 2).sum(0)
    ss_tot = ((y - y.mean(0)) ** 2).sum(0) + 1e-12
    return 1.0 - ss_res / ss_tot


def ridge_r2(z_tr, y_tr, z_te, y_te,
             lams=(1e-3, 1e-2, 0.1, 1.0, 10.0)):
    """Closed-form ridge with per-target lambda chosen on a validation
    split; held-out R^2 per column. Near-collinear latent dims otherwise
    produce huge canceling weights that fit train and explode on test —
    the sweep is standard probing practice. float64 throughout."""
    z_tr, y_tr = np.float64(z_tr), np.float64(y_tr)
    z_te, y_te = np.float64(z_te), np.float64(y_te)
    mu, sd = z_tr.mean(0), z_tr.std(0) + 1e-6

    def design(z):
        return np.concatenate([(z - mu) / sd, np.ones((len(z), 1))], axis=1)

    a_tr, a_te = design(z_tr), design(z_te)
    n_fit = int(0.8 * len(a_tr))
    best = np.full(y_tr.shape[1], -np.inf)
    lam_star = np.full(y_tr.shape[1], lams[0])
    for lam in lams:
        w = _ridge_fit(a_tr[:n_fit], y_tr[:n_fit], lam)
        val = _r2(y_tr[n_fit:], a_tr[n_fit:] @ w)
        better = val > best
        best = np.where(better, val, best)
        lam_star = np.where(better, lam, lam_star)
    out = np.empty(y_tr.shape[1])
    for j in range(y_tr.shape[1]):
        w = _ridge_fit(a_tr, y_tr[:, [j]], float(lam_star[j]))
        out[j] = _r2(y_te[:, [j]], a_te @ w)[0]
    return out


def light_probe_acc(z_tr, y_tr, z_te, y_te, iters: int = 300,
                    lr: float = 0.5, seed: int = 0):
    """Multinomial logistic probe (full-batch GD on standardized latents)."""
    rng = np.random.RandomState(seed)
    z_tr, z_te = np.float64(z_tr), np.float64(z_te)
    classes = np.unique(np.concatenate([y_tr, y_te])).astype(int)
    k = int(classes.max()) + 1
    mu, sd = z_tr.mean(0), z_tr.std(0) + 1e-6
    a_tr = np.concatenate([(z_tr - mu) / sd,
                           np.ones((len(z_tr), 1))], axis=1)
    a_te = np.concatenate([(z_te - mu) / sd,
                           np.ones((len(z_te), 1))], axis=1)
    w = rng.randn(a_tr.shape[1], k) * 0.01
    onehot = np.eye(k)[y_tr.astype(int)]
    for _ in range(iters):
        logits = a_tr @ w
        logits -= logits.max(1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(1, keepdims=True)
        g = a_tr.T @ (p - onehot) / len(a_tr) + 1e-4 * w
        w -= lr * g
    pred = (a_te @ w).argmax(1)
    acc = float((pred == y_te.astype(int)).mean())
    maj = float((y_te.astype(int) == np.bincount(
        y_tr.astype(int), minlength=k).argmax()).mean())
    return acc, maj


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=3000)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--encoder", default="/tmp/cascade_proof/encoder.msgpack")
    p.add_argument("--out", default=None)
    p.add_argument("--route-geom", action="store_true",
                   help="encoder was trained with pred_route_geom; build "
                        "the matching cfg so the checkpoint tree loads")
    p.add_argument("--camera-route", action="store_true",
                   help="encoder was trained with in_route_blank (camera-"
                        "route experiment); blank the route plane when "
                        "encoding so the probe matches the training input")
    p.add_argument("--production", action="store_true",
                   help="probe a production-size encoder checkpoint "
                        "(danet_params defaults) instead of the small "
                        "cascade-proof config")
    p.add_argument("--cache", default="/tmp/latent_probe_cache.npz",
                   help="npz of latents+targets, reused when present")
    p.add_argument("--route-legs", type=int, default=3,
                   help="synthetic-route legs for the probe env (use a "
                        "shape-specific --cache when changing this)")
    p.add_argument("--leg-min", type=float, default=40.0)
    p.add_argument("--leg-max", type=float, default=90.0)
    args = p.parse_args()

    import jax

    from cadre_tpu.configs.danet_config import danet_params
    from cadre_tpu.models.danet import create_danet
    from cadre_tpu.utils.checkpoint import load_danet_checkpoint

    size = {} if args.production else dict(
        da_feature_channel=64, inter_att_dims=48, z_dims=32)
    cfg = danet_params(pred_route_geom=args.route_geom,
                       in_route_blank=args.camera_route, **size)
    # the cache holds FRAMES + targets only; latents are always encoded
    # fresh (a cached latent is tied to one specific encoder checkpoint —
    # reusing it for a different --encoder silently probes the wrong model)
    cache = args.cache
    if cache and os.path.exists(cache):
        d = np.load(cache)
        if "rgb" in d:
            rgb, fig, targets = d["rgb"], d["fig"], d["targets"]
            print(f"loaded {len(targets)} cached frames from {cache}",
                  flush=True)
        else:   # legacy latents-only cache: unusable, re-collect
            print(f"stale latents-only cache {cache}; re-collecting",
                  flush=True)
            rgb, fig, targets = collect_frames(
                args.frames, args.seed, args.route_legs,
                (args.leg_min, args.leg_max))
    else:
        print(f"collecting {args.frames} frames ...", flush=True)
        rgb, fig, targets = collect_frames(
            args.frames, args.seed, args.route_legs,
            (args.leg_min, args.leg_max))
    if cache:
        np.savez_compressed(cache, rgb=rgb, fig=fig, targets=targets)
    trained_vars = load_danet_checkpoint(args.encoder, cfg)
    _, random_vars = create_danet(cfg, jax.random.PRNGKey(123))
    zs = {}
    for label, variables in (("trained", trained_vars),
                             ("random", random_vars)):
        print(f"encoding with {label} encoder ...", flush=True)
        zs[label] = encode(variables, cfg, rgb, fig)
    # skyline: the route-fig INPUT downsampled to 16x16 — if the raw
    # pixels decode the targets and the latents don't, the encoders
    # are discarding the signal (objective mismatch), not the data
    f = fig.astype(np.float32)
    m = f.max(axis=(1, 2), keepdims=True)
    f = np.where(m > 0, f / np.maximum(m, 1e-6), f)
    h, w = f.shape[1] // 16, f.shape[2] // 16
    pooled = f[:, :16 * h, :16 * w].reshape(len(f), 16, h, 16, w)
    zs["route_fig_16x16"] = pooled.mean(axis=(2, 4)).reshape(len(f), -1)
    n_tr = int(0.8 * len(targets))

    out = {"frames": int(len(targets)), "train_frames": n_tr,
           "encoder": args.encoder, "targets": {}}
    names = ["dis", "theta", "expert_steer"]
    for label in zs:
        z = zs[label]
        r2 = ridge_r2(z[:n_tr], targets[:n_tr, :3],
                      z[n_tr:], targets[n_tr:, :3])
        acc, maj = light_probe_acc(z[:n_tr], targets[:n_tr, 3],
                                   z[n_tr:], targets[n_tr:, 3])
        out["targets"][label] = {
            **{f"r2_{n}": round(float(v), 4) for n, v in zip(names, r2)},
            "light_acc": round(acc, 4),
            "light_majority_baseline": round(maj, 4),
        }
        print(label, json.dumps(out["targets"][label]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
