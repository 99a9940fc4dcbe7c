"""cadre_tpu — a TPU-native (JAX/XLA/Pallas/pjit) cascade deep-RL framework for
vision-based autonomous urban driving, with the capabilities of BIT-MCS/Cadre
(CADRE, AAAI 2022).

Stack (bottom → top):
  ops/         Pallas + XLA kernels (dual attention, GAE scan, fused preprocessing)
  models/      pure-functional flax models: ResNet18 backbone, DANet encoder
               (position/channel dual attention + inter-task attention), decoder
               bank, BC head, command-banked PPO policies with LSTM memory
  rl/          rollout buffers (pytree + lax.scan GAE), clipped PPO update,
               cascade agent (act / update fully jitted)
  envs/        host-side environment layer: CARLA EnvWrapper contract
               (reset/step/tick_data), decomposed reward, route rasterizer,
               GPS route planner, route indexers, fake+toy envs for testing
  parallel/    mesh/sharding utilities, data-parallel (psum) train steps
  perception/  offline multi-task perception pretraining pipeline
  runtime/     native (C++) host runtime pieces: shared-memory ring buffer for
               env→device observation streaming
  utils/       config engine, logging, checkpointing (+ torch .pt import)
  configs/     default experiment configs mirroring the reference's contract

Reference parity citations use `<file>:<line>` relative to the BIT-MCS/Cadre
repo (mounted read-only during development).
"""

__version__ = "0.1.0"
