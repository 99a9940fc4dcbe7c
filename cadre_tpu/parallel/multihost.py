"""Multi-host initialization.

The reference's multi-node story is NCCL env:// process groups
(experiments_builder.py:99-101, commented init in train.py:68-72). The
TPU-native equivalent is jax.distributed over DCN: after
`initialize_multihost`, `jax.devices()` spans all hosts and every mesh/
shard_map in this framework scales transparently — XLA routes in-slice
collectives over ICI and cross-slice over DCN.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    No-ops (returns False) when single-host or already initialized. On TPU
    pods the arguments are auto-detected from the environment; explicit
    values support CPU/GPU clusters and tests.
    """
    if jax.process_count() > 1:
        return True  # already initialized
    env_addr = coordinator_address or os.environ.get("JAX_COORDINATOR")
    env_n = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    if env_addr is None and env_n == 0 and "TPU_WORKER_HOSTNAMES" not in \
            os.environ:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=env_addr,
            num_processes=env_n or None,
            process_id=process_id if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0")) or None,
        )
        return True
    except (RuntimeError, ValueError):
        return False


def is_chief() -> bool:
    """Process 0 owns logging/checkpointing (the reference's rank==0)."""
    return jax.process_index() == 0
