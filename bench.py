"""Benchmark: DANet perception throughput on TPU vs the PyTorch-CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Primary metric (BASELINE.json config 1 scaled to the production act path):
frames/sec/chip through the DANet encoder latent at 144x256x4. vs_baseline
is the speedup over the same architecture run in PyTorch on CPU (the
reference's CPU inference path; torch twin in cadre_tpu/utils/torch_twin.py).
Target: >=10x.
"""
from __future__ import annotations

import json
import time

import numpy as np


def bench_jax(batch: int = 32, iters: int = 50, warmup: int = 5):
    import jax
    import jax.numpy as jnp

    from cadre_tpu.configs.danet_config import danet_params
    from cadre_tpu.models.danet import DANet, create_danet

    cfg = danet_params()
    model, variables = create_danet(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (batch, cfg.image_height, cfg.image_width,
                            cfg.input_channel))
    fn = jax.jit(lambda v, x: model.apply(v, x, method=DANet.latent))
    z = fn(variables, x)
    jax.block_until_ready(z)
    for _ in range(warmup):
        z = fn(variables, x)
    jax.block_until_ready(z)
    t0 = time.perf_counter()
    for _ in range(iters):
        z = fn(variables, x)
    jax.block_until_ready(z)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, jax.default_backend()


def bench_torch_cpu(batch: int = 8, iters: int = 5):
    import torch

    from cadre_tpu.configs.danet_config import danet_params
    from cadre_tpu.utils.torch_twin import build_torch_twin

    cfg = danet_params()
    torch.set_num_threads(max(1, (torch.get_num_threads() or 4)))
    twin = build_torch_twin(cfg)
    x = torch.rand(batch, cfg.input_channel, cfg.image_height,
                   cfg.image_width)
    with torch.no_grad():
        twin.latent(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            twin.latent(x)
        dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main():
    jax_fps, backend = bench_jax()
    torch_fps = bench_torch_cpu()
    print(json.dumps({
        "metric": "danet_latent_frames_per_sec_per_chip",
        "value": round(jax_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(jax_fps / torch_fps, 2),
        "baseline_torch_cpu_fps": round(torch_fps, 1),
        "backend": backend,
        "batch": 32,
    }))


if __name__ == "__main__":
    main()
