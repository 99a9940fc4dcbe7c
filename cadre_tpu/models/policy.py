"""Command-banked PPO policy models: LSTM memory + categorical actor-critic.

The reference keeps 16 separate torch modules — {steer,throttle} x
{lstm,ppo} x 4 commands — in a dict (ppo_agent/models.py:97-126) and, during
updates, evaluates all 4 command banks and masks by `command_batch ==
command` (ppo_agent/agent.py:170-182). The TPU-native design stores each
bank as ONE pytree with a leading command axis and uses vmap/one-hot masking:
the same dense-all-experts math, but a single fused program.

Components:
  - LSTMCell: torch nn.LSTMCell semantics (gate order i,f,g,o; two bias
    vectors) with orthogonal weight / zero bias init (models.py:130-137).
  - CategoricalHead: 3-layer MLP 530->128->128->num_bins, orthogonal init
    gain 0.01 (distributions.py:29-40).
  - Critic: 530->128->128->1, orthogonal gain 1 (models.py:170-177).
  - PolicyBank: functional container of stacked params + pure apply fns.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cadre_tpu.rl.distributions import (
    categorical_entropy,
    categorical_log_prob,
    categorical_sample,
    ordinal_logits,
)


def _orthogonal(gain: float):
    return nn.initializers.orthogonal(scale=gain)


class LSTMCell(nn.Module):
    """torch nn.LSTMCell parity: i,f,g,o gate order, separate ih/hh biases."""

    hidden: int

    @nn.compact
    def __call__(self, x, carry):
        h, c = carry
        in_dim = x.shape[-1]
        w_ih = self.param("weight_ih", _orthogonal(1.0),
                          (4 * self.hidden, in_dim))
        w_hh = self.param("weight_hh", _orthogonal(1.0),
                          (4 * self.hidden, self.hidden))
        b_ih = self.param("bias_ih", nn.initializers.zeros, (4 * self.hidden,))
        b_hh = self.param("bias_hh", nn.initializers.zeros, (4 * self.hidden,))
        gates = x @ w_ih.T + b_ih + h @ w_hh.T + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, (h_new, c_new)


class LSTMModel(nn.Module):
    """Single-step or unrolled LSTM (ppo_agent/models.py:139-152).

    `__call__` handles one step [N, F]; `unroll` consumes [T, N, F] via
    lax.scan (replacing the reference's python loop) and returns the final
    hidden output, matching the reference's T*N -> final-h behavior.
    """

    hidden: int

    def setup(self):
        self.cell = LSTMCell(self.hidden, name="rnn")

    def __call__(self, x, carry):
        return self.cell(x, carry)

    def unroll(self, xs, carry):
        """xs: [T, N, F] -> (carry, h_final [N, H]) via lax.scan.

        Replaces the reference's python loop over T (models.py:144-151);
        only the final hidden output is consumed downstream.
        """

        def step(carry, x):
            _, carry = self.cell(x, carry)
            return carry, carry[0]

        carry, _hs = jax.lax.scan(step, carry, xs)
        return carry, carry[0]


class TransformerMemory(nn.Module):
    """Causal-attention alternative to the LSTM memory (beyond-parity
    extension, SURVEY §5.7).

    The reference's LSTM carry is effectively always zero (agent.py:38-40,
    123-124), so its memory is exactly the seq_length frame window — which a
    small causal transformer models natively and in parallel on the MXU
    instead of a sequential scan. Interface-compatible with
    LSTMModel.unroll: xs [T, N, F] -> (carry, feat [N, F]); the carry is
    passed through untouched (stateless over the window).
    """

    hidden: int
    num_layers: int = 2
    num_heads: int = 2
    max_len: int = 32

    @nn.compact
    def unroll(self, xs, carry):
        t, n, f = xs.shape
        x = jnp.transpose(xs, (1, 0, 2))  # [N, T, F]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.max_len, self.hidden))
        x = nn.Dense(self.hidden, name="in_proj")(x) + pos[:t]
        mask = nn.make_causal_mask(jnp.ones((n, t)))
        for i in range(self.num_layers):
            y = nn.LayerNorm(name=f"ln1_{i}")(x)
            y = nn.SelfAttention(num_heads=self.num_heads,
                                 name=f"attn_{i}")(y, mask=mask)
            x = x + y
            y = nn.LayerNorm(name=f"ln2_{i}")(x)
            y = nn.Dense(4 * self.hidden, name=f"mlp1_{i}")(y)
            y = nn.Dense(self.hidden, name=f"mlp2_{i}")(nn.gelu(y))
            x = x + y
        x = nn.LayerNorm(name="ln_out")(x)
        return carry, x[:, -1, :]  # newest-frame representation

    def __call__(self, x, carry):
        """Single-step fallback: treat the step as a length-1 window."""
        carry, feat = self.unroll(x[None], carry)
        return feat, carry


class CategoricalHead(nn.Module):
    """Actor MLP -> logits (distributions.py:34-40); optional ordinal mode."""

    num_outputs: int
    hidsize: int = 128
    ordinal: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidsize, kernel_init=_orthogonal(0.01),
                     bias_init=nn.initializers.zeros, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidsize, kernel_init=_orthogonal(0.01),
                     bias_init=nn.initializers.zeros, name="fc2")(x)
        x = nn.relu(x)
        logits = nn.Dense(self.num_outputs, kernel_init=_orthogonal(0.01),
                          bias_init=nn.initializers.zeros, name="fc3")(x)
        if self.ordinal:
            logits = ordinal_logits(logits)
        return logits


class ActorCritic(nn.Module):
    """One PPO head: categorical actor + 3-layer critic (models.py:162-212)."""

    num_outputs: int
    hidsize: int = 128
    ordinal: bool = False

    def setup(self):
        self.control = CategoricalHead(self.num_outputs, self.hidsize,
                                       self.ordinal, name="control")
        self.critic_fc1 = nn.Dense(self.hidsize, kernel_init=_orthogonal(1.0),
                                   bias_init=nn.initializers.zeros,
                                   name="critic_fc1")
        self.critic_fc2 = nn.Dense(self.hidsize, kernel_init=_orthogonal(1.0),
                                   bias_init=nn.initializers.zeros,
                                   name="critic_fc2")
        self.critic_fc3 = nn.Dense(1, kernel_init=_orthogonal(1.0),
                                   bias_init=nn.initializers.zeros,
                                   name="critic_fc3")

    def value(self, x):
        h = nn.relu(self.critic_fc1(x))
        h = nn.relu(self.critic_fc2(h))
        return self.critic_fc3(h)

    def __call__(self, x):
        return self.control(x), self.value(x)


class PolicyOutput(NamedTuple):
    action: jax.Array
    log_prob: jax.Array
    value: jax.Array
    logits: jax.Array


@dataclasses.dataclass
class PolicyBankDef:
    """Static definition of one signal's policy bank (e.g. steer).

    `memory`: 'lstm' (reference parity), 'transformer' (beyond-parity
    causal-attention window memory), or 'none'. `use_lstm=False` is the
    legacy spelling of memory='none'.
    """

    num_commands: int
    num_outputs: int
    feature_dim: int
    use_lstm: bool = True
    ordinal: bool = False
    memory: str = "lstm"

    @property
    def _memory_kind(self):
        return self.memory if self.use_lstm else "none"

    def make_modules(self):
        ac = ActorCritic(self.num_outputs, ordinal=self.ordinal)
        kind = self._memory_kind
        if kind == "lstm":
            mem = LSTMModel(self.feature_dim)
        elif kind == "transformer":
            mem = TransformerMemory(self.feature_dim)
        else:
            mem = None
        return ac, mem

    def init_params(self, rng: jax.Array):
        """Stacked params with leading [num_commands] axis per bank."""
        ac, mem = self.make_modules()
        x = jnp.zeros((1, self.feature_dim))
        carry = (jnp.zeros((1, self.feature_dim)),
                 jnp.zeros((1, self.feature_dim)))

        def init_one(key):
            k1, k2 = jax.random.split(key)
            p = {"ac": ac.init(k1, x)["params"]}
            if mem is not None:
                p["lstm"] = mem.init(k2, x, carry)["params"]
            return p

        keys = jax.random.split(rng, self.num_commands)
        return jax.vmap(init_one)(keys)

    # ---------------- pure apply fns ----------------

    def _select(self, bank_params, command):
        return jax.tree.map(lambda p: p[command], bank_params)

    def features(self, bank_params, command, obs, carry):
        """Memory step for one command: obs [N,F] -> (feat [N,F], carry)."""
        _, mem = self.make_modules()
        if mem is None:
            return obs, carry
        p = self._select(bank_params, command)
        return mem.apply({"params": p["lstm"]}, obs, carry)

    def act(self, bank_params, command, obs, carry, rng):
        """Single-env act (agent.py:114-141): LSTM -> sample + value."""
        ac, _ = self.make_modules()
        feat, new_carry = self.features(bank_params, command, obs, carry)
        p = self._select(bank_params, command)
        logits, value = ac.apply({"params": p["ac"]}, feat)
        action = categorical_sample(logits, rng)
        log_prob = categorical_log_prob(logits, action)
        return PolicyOutput(action, log_prob, value[..., 0], logits), new_carry

    def act_seq(self, bank_params, command, obs_seq, carry, rng):
        """Act from a feature sequence [T, N, F] unrolled through the memory
        (the reference's act feeds all 8 frame features each step,
        models.py:144-151 via agent.py:123-124)."""
        ac, mem = self.make_modules()
        p = self._select(bank_params, command)
        if mem is not None:
            new_carry, feat = mem.apply({"params": p["lstm"]}, obs_seq,
                                        carry, method=type(mem).unroll)
        else:
            feat, new_carry = obs_seq[-1], carry
        logits, value = ac.apply({"params": p["ac"]}, feat)
        action = categorical_sample(logits, rng)
        log_prob = categorical_log_prob(logits, action)
        return PolicyOutput(action, log_prob, value[..., 0], logits), new_carry

    def value(self, bank_params, command, obs, carry):
        ac, _ = self.make_modules()
        feat, _ = self.features(bank_params, command, obs, carry)
        p = self._select(bank_params, command)
        return ac.apply({"params": p["ac"]}, feat, method=ActorCritic.value)[..., 0]

    def act_batch(self, bank_params, commands, obs_seq, carry, rng):
        """Batched act across N envs with per-env commands.

        obs_seq: [T, N, F]; commands: [N] int; carry: ([N,F],[N,F]).
        Evaluates all command banks densely (the update path's pattern,
        agent.py:170-182) and gathers each env's own bank — one fused
        program instead of N python dispatches.
        Returns (PolicyOutput of [N] arrays, carry [N,F] pair from the
        selected banks).
        """
        ac, mem = self.make_modules()

        def eval_one(p):
            if mem is not None:
                new_carry, feat = mem.apply({"params": p["lstm"]}, obs_seq,
                                            carry, method=type(mem).unroll)
            else:
                feat, new_carry = obs_seq[-1], carry
            logits, value = ac.apply({"params": p["ac"]}, feat)
            return logits, value[..., 0], new_carry

        logits_c, values_c, carats = jax.vmap(eval_one)(bank_params)
        n = commands.shape[0]
        idx = (commands, jnp.arange(n))
        logits = logits_c[idx]        # [N, A]
        value = values_c[idx]         # [N]
        new_carry = (carats[0][idx], carats[1][idx])
        action = categorical_sample(logits, rng)
        log_prob = categorical_log_prob(logits, action)
        return PolicyOutput(action, log_prob, value, logits), new_carry

    def evaluate_masked(self, bank_params, obs_seq, carry, action, command_b):
        """All-command evaluation with one-hot masking (agent.py:170-182).

        obs_seq: [T, N, F] sequence fed through each command's LSTM unroll
        (the reference feeds [T*N, F] and loops T); carry: ([N,F],[N,F]) from
        the stored rollout hidden state; action, command_b: [N].
        Returns (value [N], log_prob [N], entropy [N]) summed over commands
        masked by command_b == c — identical math to the reference's
        sum-of-masked-banks.
        """
        ac, mem = self.make_modules()

        def eval_one(p):
            if mem is not None:
                feat = mem.apply({"params": p["lstm"]}, obs_seq, carry,
                                 method=type(mem).unroll)[1]
            else:
                feat = obs_seq[-1]
            logits, value = ac.apply({"params": p["ac"]}, feat)
            lp = categorical_log_prob(logits, action)
            ent = categorical_entropy(logits)
            return value[..., 0], lp, ent

        values, lps, ents = jax.vmap(eval_one)(bank_params)  # [C, N]
        onehot = jax.nn.one_hot(command_b, self.num_commands,
                                dtype=values.dtype).T  # [C, N]
        return ((values * onehot).sum(0), (lps * onehot).sum(0),
                (ents * onehot).sum(0))
