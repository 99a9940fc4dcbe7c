"""Action distributions as pure functions over logits/moments.

Behavioral contract from ppo_agent/distributions.py:
  - Categorical_1d (:25-109): 3-layer MLP -> logits (the MLP lives in
    `cadre_tpu.models.policy`); softmax_sample (:96-99) draws from
    softmax(logits); log_probs (:101-102) and entropy (:104-105) are the
    standard categorical quantities.
  - The ordinal-policy transform (:68-79) is commented out in the reference;
    here it is exposed as a real option (`ordinal_logits`) since the masks
    were built but never wired.
  - DiagGaussian family (:112-182) for continuous-control variants: tanh/
    sigmoid-squashed mean MLP + state-independent logstd, with log_prob
    summed over the last axis and entropy summed likewise (:11-16).

Everything is jit/vmap-safe; sampling takes explicit PRNG keys.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ------------------------------ categorical ------------------------------

def categorical_sample(logits: jax.Array, rng: jax.Array) -> jax.Array:
    """Sample from softmax(logits) along the last axis."""
    return jax.random.categorical(rng, logits, axis=-1)


def categorical_log_prob(logits: jax.Array, action: jax.Array) -> jax.Array:
    """log p(action); action int array broadcastable to logits[..., 0]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, action[..., None], axis=-1)[..., 0]


def categorical_entropy(logits: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return -jnp.sum(p * logp, axis=-1)


def categorical_mode(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, axis=-1)


def ordinal_logits(raw: jax.Array) -> jax.Array:
    """Ordinal-policy transform (distributions.py:68-79, mask1 variant :58-64).

    logit_i = sum_{j<=i} log sigmoid(raw_j) + sum_{j>i} log(1-sigmoid(raw_j)).
    Encourages unimodal action distributions over ordered bins (steering).
    """
    s = jax.nn.sigmoid(raw)
    n = raw.shape[-1]
    log_s = jnp.log(s + 1e-8)
    log_1ms = jnp.log(1 - s + 1e-8)
    # mask[i, j] = 1 if i >= j (construct_mask1)
    mask = jnp.tril(jnp.ones((n, n), raw.dtype))
    return jnp.einsum("...j,ij->...i", log_s, mask) + jnp.einsum(
        "...j,ij->...i", log_1ms, 1.0 - mask)


# ------------------------------ diagonal gaussian ------------------------

def normal_log_prob(mean: jax.Array, logstd: jax.Array,
                    action: jax.Array) -> jax.Array:
    """Sum of per-dim normal log-probs (FixedNormal.log_probs, :11-13)."""
    var = jnp.exp(2 * logstd)
    lp = -0.5 * ((action - mean) ** 2 / var) - logstd - 0.5 * jnp.log(
        2 * jnp.pi)
    return jnp.sum(lp, axis=-1)


def normal_entropy(logstd: jax.Array) -> jax.Array:
    """Sum of per-dim entropies (FixedNormal.entropy, :15-16)."""
    return jnp.sum(0.5 + 0.5 * jnp.log(2 * jnp.pi) + logstd, axis=-1)


def normal_sample(mean: jax.Array, logstd: jax.Array, rng: jax.Array,
                  clip: tuple | None = None) -> jax.Array:
    x = mean + jnp.exp(logstd) * jax.random.normal(rng, mean.shape,
                                                   mean.dtype)
    if clip is not None:
        x = jnp.clip(x, clip[0], clip[1])
    return x
