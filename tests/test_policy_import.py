"""Reference RL snapshot import: torch policy modules -> stacked banks with
identical outputs (the 'policy actions reproduce' north-star leg)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from cadre_tpu.models.policy import ActorCritic, LSTMModel, PolicyBankDef  # noqa: E402
from cadre_tpu.utils.checkpoint import import_policy_torch  # noqa: E402

F = 12  # feature dim
A = 5   # action bins


class TorchPolicyTwin(tnn.Module):
    """Reference Model layout (ppo_agent/models.py:162-177 +
    distributions.py:34-40): control.linear Sequential + critic Sequential."""

    def __init__(self, num_out):
        super().__init__()
        control = tnn.Module()
        control.linear = tnn.Sequential(
            tnn.Linear(F, 128), tnn.ReLU(), tnn.Linear(128, 128),
            tnn.ReLU(), tnn.Linear(128, num_out))
        self.control = control
        self.critic = tnn.Sequential(
            tnn.Linear(F, 128), tnn.ReLU(), tnn.Linear(128, 128),
            tnn.ReLU(), tnn.Linear(128, 1))

    def forward(self, x):
        return self.control.linear(x), self.critic(x)


class TorchLSTMTwin(tnn.Module):
    """Reference LSTM wrapper (models.py:130-137)."""

    def __init__(self):
        super().__init__()
        self.rnn = tnn.LSTMCell(F, F)


@pytest.fixture(scope="module")
def imported():
    torch.manual_seed(0)
    snapshot = {}
    twins = {}
    for signal, nout in [("steer", A), ("throttle", 3)]:
        for k in range(4):
            m = TorchPolicyTwin(nout).eval()
            lstm = TorchLSTMTwin().eval()
            snapshot[f"{signal}_ppo_{k}"] = m
            twins[(signal, "ppo", k)] = m
            if not (signal == "throttle"):  # mimic missing throttle_lstm
                snapshot[f"{signal}_lstm_{k}"] = lstm
                twins[(signal, "lstm", k)] = lstm

    steer_def = PolicyBankDef(4, A, F)
    throttle_def = PolicyBankDef(4, 3, F)
    steer_params = steer_def.init_params(jax.random.PRNGKey(0))
    throttle_params = throttle_def.init_params(jax.random.PRNGKey(1))
    params, missing = import_policy_torch(snapshot, steer_params,
                                          throttle_params)
    return steer_def, throttle_def, params, missing, twins


def test_missing_banks_reported(imported):
    *_, missing, _ = imported
    assert set(missing) == {f"throttle_lstm_{k}" for k in range(4)}


def test_actor_critic_outputs_match(imported):
    steer_def, _, params, _, twins = imported
    x = torch.randn(3, F)
    for k in range(4):
        with torch.no_grad():
            ref_logits, ref_value = twins[("steer", "ppo", k)](x)
        sel = jax.tree.map(lambda p: p[k], params["steer"])
        ac, _ = steer_def.make_modules()
        logits, value = ac.apply({"params": sel["ac"]},
                                 jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(value), ref_value.numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_lstm_unroll_matches(imported):
    steer_def, _, params, _, twins = imported
    T, N = 4, 2
    xs = torch.randn(T, N, F)
    h = torch.zeros(N, F)
    c = torch.zeros(N, F)
    twin = twins[("steer", "lstm", 1)]
    with torch.no_grad():
        hh, cc = h, c
        for t in range(T):
            hh, cc = twin.rnn(xs[t], (hh, cc))
    sel = jax.tree.map(lambda p: p[1], params["steer"])
    _, lstm = steer_def.make_modules()
    carry, feat = lstm.apply({"params": sel["lstm"]},
                             jnp.asarray(xs.numpy()),
                             (jnp.zeros((N, F)), jnp.zeros((N, F))),
                             method=LSTMModel.unroll)
    np.testing.assert_allclose(np.asarray(feat), hh.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(carry[1]), cc.numpy(), rtol=1e-4,
                               atol=1e-5)
