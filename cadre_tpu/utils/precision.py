"""Mixed-precision helpers: bf16 inference/training policies.

TPU MXU natively computes bf16 x bf16 -> f32; casting params + activations
to bf16 halves HBM weight traffic (the DANet encoder is bandwidth-bound at
small batch). BatchNorm statistics stay f32.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_params(tree: Any, dtype=jnp.bfloat16) -> Any:
    """Cast floating-point leaves; leave ints/bools untouched."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def bf16_variables(variables: dict) -> dict:
    """DANet variables -> bf16 params with f32 batch stats."""
    out = dict(variables)
    out["params"] = cast_params(variables["params"], jnp.bfloat16)
    return out
