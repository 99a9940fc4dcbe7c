"""CadreAgent: cascade inference (frozen perception encoder -> per-command
PPO policies) and PPO updates, fully jitted.

Behavioral contract from ppo_agent/agent.py:
  - pre_process (:43-75): rgb [T,H,W,3]/255; route figure per-frame
    max-normalized, transposed to image orientation, concatenated as a 4th
    channel. The 8 history frames ride the batch axis.
  - get_latent_feature (:97-112): frozen DANet latent [T,512] concat
    measurements tiled x6 -> [T,530].
  - act (:114-141): per-command LSTM + actor-critic for steer and throttle;
    softmax sampling; returns features/actions/log-probs/values/hidden.
    NOTE the reference never writes act's hidden state back to
    self.hidden_state (agent.py:38-40,123-124) — the LSTM sees a zero carry
    every step. We replicate that default (`update_hidden=False`) and expose
    the fixed behavior as an option, documented divergence.
  - get_value (:143-164): bootstrap values for GAE, zeros when done.
  - update_policy (:166-237) lives in cadre_tpu.rl.ppo.
  - save/load_snapshot (:245-271): here a flax msgpack checkpoint of both
    banks (the reference's snapshot dict double-saves steer_ppo and omits
    throttle_lstm — a bug we do NOT replicate; we save all four banks).

TPU-first: one jitted `_act` covers preprocess -> encoder -> LSTM -> heads ->
sampling; one jitted update covers the minibatch step. The eval-time
K-checkpoint ensemble is a vmap over stacked params (`EnsembleAgent`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cadre_tpu.configs.agent_config import AgentConfig
from cadre_tpu.configs.danet_config import DANetParams, danet_params
from cadre_tpu.models.danet import DANet, create_danet
from cadre_tpu.models.policy import PolicyBankDef
from cadre_tpu.rl.ppo import PPOConfig, make_optimizer, make_update_fn
from cadre_tpu.utils import checkpoint as ckpt


class ActResult(NamedTuple):
    features: jax.Array          # [T, 530] latent+measurements
    steer_action: jax.Array      # scalar int32
    throttle_action: jax.Array   # scalar int32
    steer_log_prob: jax.Array
    throttle_log_prob: jax.Array
    steer_value: jax.Array
    throttle_value: jax.Array
    hidden: Tuple[jax.Array, jax.Array]


def preprocess_obs(rgb: jax.Array, route_fig: jax.Array,
                   blank_route: bool = False) -> jax.Array:
    """tick_data -> encoder input [T, H, W, 4] (agent.py:43-75).

    rgb: [T, H, W, 3] uint8/float; route_fig: [T, W, H] raster (the route
    figure is drawn transposed, env_wrapper.py:242) -> normalized to [0,1]
    per frame by its max, transposed to [T, H, W].

    `blank_route` (DANetParams.in_route_blank, the camera-route cascade
    experiment) zeroes the route plane: route geometry must be perceived
    from the camera's painted ribbon instead of read off the clean raster.
    """
    rgb = rgb.astype(jnp.float32) / 255.0
    route = route_fig.astype(jnp.float32)
    max_per_frame = jnp.max(route, axis=(1, 2), keepdims=True)
    route = jnp.where(max_per_frame > 0, route / max_per_frame, route)
    route = jnp.swapaxes(route, 1, 2)[..., None]  # [T, H, W, 1]
    if blank_route:
        route = jnp.zeros_like(route)
    return jnp.concatenate([rgb, route], axis=-1)


def latent_features(danet: DANet, danet_vars, x: jax.Array,
                    measurements: jax.Array) -> jax.Array:
    """Frozen encoder latent + measurements tiled x6 (agent.py:97-112).

    If the encoder params are bf16 (utils.precision.bf16_variables), the
    input is cast to match and the latent is returned in f32 for the policy.
    """
    enc_dtype = jax.tree_util.tree_leaves(danet_vars["params"])[0].dtype
    z = danet.apply(danet_vars, x.astype(enc_dtype), method=DANet.latent)
    z = z.astype(jnp.float32)
    meas = jnp.tile(measurements.astype(jnp.float32), (1, 6))
    return jnp.concatenate([z, meas], axis=-1)


@dataclasses.dataclass
class CadreAgent:
    """Cascade agent. Frozen encoder + trainable policy banks."""

    agent_cfg: AgentConfig
    danet_cfg: DANetParams
    danet: DANet
    danet_vars: Any
    steer_def: PolicyBankDef
    throttle_def: PolicyBankDef
    params: Dict[str, Any]          # {'steer': bank, 'throttle': bank}
    ppo_cfg: PPOConfig
    update_hidden: bool = False     # reference keeps a stale zero carry
    dtype: Any = jnp.float32

    @property
    def obs_dim(self) -> int:
        """latent width + tiled measurements (ppo_agent/models.py:38-41)."""
        return self.danet_cfg.latent_dim + self.agent_cfg.measurement_dim

    def __post_init__(self):
        f = self.obs_dim
        self.hidden_state = (jnp.zeros((1, f)), jnp.zeros((1, f)))
        self._act_jit = jax.jit(self._act)
        self._value_jit = jax.jit(self._bootstrap_value)
        self._update = jax.jit(
            make_update_fn(self.steer_def, self.throttle_def, self.ppo_cfg))
        self.opt_state = make_optimizer(self.ppo_cfg).init(self.params)

    # ---------------- construction ----------------

    @classmethod
    def create(cls, rng: jax.Array, agent_cfg: AgentConfig | None = None,
               danet_cfg: DANetParams | None = None,
               ppo_cfg: PPOConfig | None = None,
               danet_vars=None, bf16_encoder: bool = False):
        agent_cfg = agent_cfg or AgentConfig()
        danet_cfg = danet_cfg or danet_params()
        ppo_cfg = ppo_cfg or PPOConfig()
        k1, k2, k3 = jax.random.split(rng, 3)
        danet, fresh_vars = create_danet(danet_cfg, k1)
        if danet_vars is not None:
            # checkpoint loaders return host numpy pytrees; committing them
            # to device ONCE here matters enormously on a remote-TPU link —
            # numpy leaves are re-uploaded on EVERY jit dispatch (129 MB/tick
            # for the production encoder ≈ 1.3 s/tick measured on the tunnel)
            danet_vars = jax.tree.map(jnp.asarray, danet_vars)
        else:
            danet_vars = fresh_vars
        if bf16_encoder:
            from cadre_tpu.utils.precision import bf16_variables

            danet_vars = bf16_variables(danet_vars)
        f = danet_cfg.latent_dim + agent_cfg.measurement_dim
        steer_def = PolicyBankDef(agent_cfg.command_num,
                                  agent_cfg.num_steer_outputs, f,
                                  use_lstm=agent_cfg.use_lstm,
                                  ordinal=agent_cfg.ordinal,
                                  memory=agent_cfg.memory)
        throttle_def = PolicyBankDef(agent_cfg.command_num,
                                     agent_cfg.num_throttle_outputs, f,
                                     use_lstm=agent_cfg.use_lstm,
                                     ordinal=agent_cfg.ordinal,
                                     memory=agent_cfg.memory)
        params = {"steer": steer_def.init_params(k2),
                  "throttle": throttle_def.init_params(k3)}
        return cls(agent_cfg=agent_cfg, danet_cfg=danet_cfg, danet=danet,
                   danet_vars=danet_vars, steer_def=steer_def,
                   throttle_def=throttle_def, params=params, ppo_cfg=ppo_cfg)

    # ---------------- inference ----------------

    def _act(self, params, danet_vars, rgb, route_fig, measurements, command,
             hidden, rng):
        x = preprocess_obs(rgb, route_fig,
                           blank_route=self.danet_cfg.in_route_blank)
        feats = latent_features(self.danet, danet_vars, x, measurements)
        # all T frame features unroll through the LSTM every act
        # (models.py:144-151 via agent.py:123-124); N = 1 env
        obs_seq = feats[:, None, :]
        rs, rt = jax.random.split(rng)
        steer_out, hidden_s = self.steer_def.act_seq(
            params["steer"], command, obs_seq, hidden, rs)
        throttle_out, _ = self.throttle_def.act_seq(
            params["throttle"], command, obs_seq, hidden, rt)
        return ActResult(feats, steer_out.action[0], throttle_out.action[0],
                         steer_out.log_prob[0], throttle_out.log_prob[0],
                         steer_out.value[0], throttle_out.value[0], hidden_s)

    def act(self, tick_data: Dict[str, Any], rng: jax.Array) -> ActResult:
        """tick_data: dict with 'rgb' [T,H,W,3], 'route_fig' [T,W,H],
        'measurements' [T,3], 'command' int."""
        out = self._act_jit(
            self.params, self.danet_vars,
            jnp.asarray(tick_data["rgb"]), jnp.asarray(tick_data["route_fig"]),
            jnp.asarray(tick_data["measurements"]),
            jnp.asarray(tick_data["command"], jnp.int32),
            self.hidden_state, rng)
        if self.update_hidden:
            self.hidden_state = out.hidden
        return out

    def _act_vec(self, params, danet_vars, rgb, route_fig, measurements,
                 commands, hidden, rng):
        """Batched act over N envs: rgb [N,T,H,W,3], route_fig [N,T,W,H],
        measurements [N,T,3], commands [N], hidden ([N,F],[N,F])."""
        n, t = rgb.shape[0], rgb.shape[1]
        x = preprocess_obs(rgb.reshape((n * t,) + rgb.shape[2:]),
                           route_fig.reshape((n * t,) + route_fig.shape[2:]),
                           blank_route=self.danet_cfg.in_route_blank)
        feats = latent_features(self.danet, danet_vars, x,
                                measurements.reshape(n * t, -1))
        feats = feats.reshape(n, t, -1)
        obs_seq = jnp.transpose(feats, (1, 0, 2))  # [T, N, F]
        rs, rt = jax.random.split(rng)
        steer_out, hidden_s = self.steer_def.act_batch(
            params["steer"], commands, obs_seq, hidden, rs)
        throttle_out, _ = self.throttle_def.act_batch(
            params["throttle"], commands, obs_seq, hidden, rt)
        return feats, steer_out, throttle_out, hidden_s

    def act_vec(self, tick_batch: Dict[str, Any], hidden, rng: jax.Array):
        """Vectorized act for VecDrivingEnv tick batches."""
        if not hasattr(self, "_act_vec_jit"):
            self._act_vec_jit = jax.jit(self._act_vec)
        return self._act_vec_jit(
            self.params, self.danet_vars,
            jnp.asarray(tick_batch["rgb"]),
            jnp.asarray(tick_batch["route_fig"]),
            jnp.asarray(tick_batch["measurements"]),
            jnp.asarray(tick_batch["command"], jnp.int32),
            hidden, rng)

    # ------------- incremental (device-resident feature history) -------------

    def _encode_last(self, danet_vars, rgb_last, route_last, meas_last):
        """Encode ONLY the newest frame per env: [N,H,W,3] -> [N,F].

        The frame-feature history lives on device (see act_vec_incremental);
        per-tick host->device traffic drops from N*T frames to N frames —
        the PCIe/tunnel-bound fix for the act path.
        """
        x = preprocess_obs(rgb_last, route_last,
                           blank_route=self.danet_cfg.in_route_blank)
        return latent_features(self.danet, danet_vars, x, meas_last)

    def _act_from_hist(self, params, feat_hist, commands, hidden, rng):
        """feat_hist: [T, N, F] device-resident features -> batched act."""
        rs, rt = jax.random.split(rng)
        steer_out, hidden_s = self.steer_def.act_batch(
            params["steer"], commands, feat_hist, hidden, rs)
        throttle_out, _ = self.throttle_def.act_batch(
            params["throttle"], commands, feat_hist, hidden, rt)
        return steer_out, throttle_out, hidden_s

    def act_vec_incremental(self, tick_batch: Dict[str, Any], feat_hist,
                            hidden, rng: jax.Array,
                            refresh: bool = False):
        """Batched act with a device-resident feature history.

        feat_hist: [T, N, F] or None. With refresh/None the full history is
        (re)encoded from the tick's frame stack (needed after env resets);
        otherwise only the newest frame is encoded and shifted in.
        Returns (steer_out, throttle_out, hidden, new_feat_hist).
        """
        if not hasattr(self, "_incr_jit"):

            def _incremental(params, danet_vars, hist, rgb_last, route_last,
                             meas_last, commands, hidden_, rng_):
                new_feats = self._encode_last(danet_vars, rgb_last,
                                              route_last, meas_last)
                hist = jnp.concatenate([hist[1:], new_feats[None]], axis=0)
                outs = self._act_from_hist(params, hist, commands, hidden_,
                                           rng_)
                return outs + (hist,)

            # one dispatch per tick: encode newest frame + shift + act
            self._incr_jit = jax.jit(_incremental)
        commands = jnp.asarray(tick_batch["command"], jnp.int32)
        if feat_hist is None or refresh:
            feats, steer_out, throttle_out, hidden_s = self.act_vec(
                tick_batch, hidden, rng)
            return steer_out, throttle_out, hidden_s, \
                jnp.transpose(feats, (1, 0, 2))
        steer_out, throttle_out, hidden_s, feat_hist = self._incr_jit(
            self.params, self.danet_vars, feat_hist,
            jnp.asarray(tick_batch["rgb"][:, -1]),
            jnp.asarray(tick_batch["route_fig"][:, -1]),
            jnp.asarray(tick_batch["measurements"][:, -1]),
            commands, hidden, rng)
        return steer_out, throttle_out, hidden_s, feat_hist

    # ------------- fused tick: store previous transition + act -------------

    def _fused_tick_impl(self, params, danet_vars, hist, sbuf, tbuf, hidden,
                         s_pend, t_pend, pend_cmd, rewards, s_mask, t_mask,
                         pend_hidden, store, rgb, route, meas, commands, rng,
                         refresh):
        """ONE program per tick. On a remote-TPU link every executed
        program costs a full round trip (~0.4 s here), so the rollout
        store of transition k rides inside the act dispatch of tick k+1:
        store(pending_k with hist_k) -> encode newest frame -> shift ->
        act. `refresh` (static) re-encodes the full frame window instead
        (after env resets)."""
        from cadre_tpu.rl.rollout import insert_batch

        feats_prev = jnp.transpose(hist, (1, 0, 2))      # [N, T, F]

        def do_store(bufs):
            # pend_hidden is the carry that was INPUT to the pending tick's
            # act — with update_hidden=True the loop's current `hidden` has
            # already advanced one step past it (the immediate-store path
            # records the pre-act carry, and update_policy re-unrolls the
            # LSTM from the stored value)
            sb, tb = bufs
            sb = insert_batch(sb, feats_prev, s_pend.action,
                              s_pend.log_prob, s_pend.value, rewards[:, 0],
                              s_mask, pend_hidden, pend_cmd)
            tb = insert_batch(tb, feats_prev, t_pend.action,
                              t_pend.log_prob, t_pend.value, rewards[:, 1],
                              t_mask, pend_hidden, pend_cmd)
            return sb, tb

        sbuf, tbuf = jax.lax.cond(store, do_store, lambda b: b,
                                  (sbuf, tbuf))
        if refresh:
            n, t = rgb.shape[0], rgb.shape[1]
            x = preprocess_obs(rgb.reshape((n * t,) + rgb.shape[2:]),
                               route.reshape((n * t,) + route.shape[2:]),
                               blank_route=self.danet_cfg.in_route_blank)
            feats = latent_features(self.danet, danet_vars, x,
                                    meas.reshape(n * t, -1))
            hist = jnp.transpose(feats.reshape(n, t, -1), (1, 0, 2))
        else:
            new_feats = self._encode_last(danet_vars, rgb, route, meas)
            hist = jnp.concatenate([hist[1:], new_feats[None]], axis=0)
        souts, touts, hidden_s = self._act_from_hist(params, hist, commands,
                                                     hidden, rng)
        return souts, touts, hidden_s, hist, sbuf, tbuf

    def zero_pending(self, num_envs: int):
        """Placeholder pending outputs for the first tick (store=False)."""
        from cadre_tpu.models.policy import PolicyOutput

        def zeros(bank_def):
            n = num_envs
            return PolicyOutput(jnp.zeros((n,), jnp.int32), jnp.zeros((n,)),
                                jnp.zeros((n,)),
                                jnp.zeros((n, bank_def.num_outputs)))

        f = self.obs_dim
        return (zeros(self.steer_def), zeros(self.throttle_def),
                jnp.zeros((num_envs,), jnp.int32),
                jnp.zeros((num_envs, 2)), jnp.ones((num_envs,)),
                jnp.ones((num_envs,)),
                (jnp.zeros((num_envs, f)), jnp.zeros((num_envs, f))))

    def act_vec_store(self, tick_batch, feat_hist, hidden, rng, steer_buf,
                      throttle_buf, pending, store: bool,
                      refresh: bool = False):
        """Batched act + deferred rollout store in one dispatch.

        pending: (steer PolicyOutput, throttle PolicyOutput, commands [N],
        rewards [N,2], steer_mask [N], throttle_mask [N], act-input hidden
        (h [N,F], c [N,F])) of the PREVIOUS tick (zero_pending(n) with
        store=False on the first tick of an iteration). Returns (steer_out,
        throttle_out, hidden', feat_hist', steer_buf', throttle_buf')."""
        if not hasattr(self, "_fused_tick_jit"):
            self._fused_tick_jit = jax.jit(self._fused_tick_impl,
                                           static_argnames=("refresh",))
        s_pend, t_pend, pend_cmd, rewards, s_mask, t_mask, pend_hidden = \
            pending
        if refresh or feat_hist is None:
            if feat_hist is None:
                t = np.asarray(tick_batch["rgb"]).shape[1]
                n = np.asarray(tick_batch["rgb"]).shape[0]
                feat_hist = jnp.zeros((t, n, self.obs_dim))
            rgb = jnp.asarray(tick_batch["rgb"])
            route = jnp.asarray(tick_batch["route_fig"])
            meas = jnp.asarray(tick_batch["measurements"])
            refresh = True
        else:
            rgb = jnp.asarray(tick_batch["rgb"][:, -1])
            route = jnp.asarray(tick_batch["route_fig"][:, -1])
            meas = jnp.asarray(tick_batch["measurements"][:, -1])
        return self._fused_tick_jit(
            self.params, self.danet_vars, feat_hist, steer_buf,
            throttle_buf, hidden, s_pend, t_pend,
            jnp.asarray(pend_cmd, jnp.int32),
            jnp.asarray(rewards, jnp.float32),
            jnp.asarray(s_mask, jnp.float32),
            jnp.asarray(t_mask, jnp.float32),
            pend_hidden,
            jnp.asarray(bool(store)),
            rgb, route, meas,
            jnp.asarray(tick_batch["command"], jnp.int32), rng,
            refresh=refresh)

    def _bootstrap_value(self, params, steer_obs, steer_cmd, throttle_obs,
                         throttle_cmd, hidden):
        """Next-state values for GAE bootstrap (agent.py:143-164).

        The reference feeds the stored [seq, F] observation through the LSTM
        as a batch; we unroll it and value the final feature.
        """
        def one(bank_def, bank_params, obs_seq, cmd):
            sel = jax.tree.map(lambda p: p[cmd], bank_params)
            if bank_def.use_lstm:
                from cadre_tpu.models.policy import LSTMModel
                _, lstm = bank_def.make_modules()
                feat = lstm.apply({"params": sel["lstm"]},
                                  obs_seq[:, None, :], hidden,
                                  method=LSTMModel.unroll)[1]
            else:
                feat = obs_seq[-1:]
            ac, _ = bank_def.make_modules()
            from cadre_tpu.models.policy import ActorCritic
            return ac.apply({"params": sel["ac"]}, feat,
                            method=ActorCritic.value)[0, 0]

        return (one(self.steer_def, params["steer"], steer_obs, steer_cmd),
                one(self.throttle_def, params["throttle"], throttle_obs,
                    throttle_cmd))

    def get_value(self, done: bool, steer_batch, throttle_batch):
        if done:
            return jnp.zeros(()), jnp.zeros(())
        steer_obs, steer_cmd = steer_batch
        throttle_obs, throttle_cmd = throttle_batch
        return self._value_jit(self.params, jnp.asarray(steer_obs),
                               jnp.asarray(steer_cmd, jnp.int32),
                               jnp.asarray(throttle_obs),
                               jnp.asarray(throttle_cmd, jnp.int32),
                               self.hidden_state)

    # ---------------- update ----------------

    def update_policy(self, steer_mb, throttle_mb):
        self.params, self.opt_state, aux = self._update(
            self.params, self.opt_state, steer_mb, throttle_mb)
        return (float(aux.value_loss), float(aux.action_loss),
                float(aux.entropy_loss))

    # ---------------- snapshots ----------------

    def save_snapshot(self, path: str, include_opt: bool = False):
        """Policy-bank snapshot; `include_opt` also persists optimizer state
        for exact training resume (the reference never checkpointed its
        Adam state, SURVEY §5.4 — a resume gap we close)."""
        tree = {"steer": self.params["steer"],
                "throttle": self.params["throttle"]}
        ckpt.save_pytree(path, tree)
        if include_opt:
            ckpt.save_pytree(path + ".opt", self.opt_state)

    def load_snapshot(self, path: str, include_opt: bool = False):
        # device-commit once; numpy leaves re-upload on every dispatch
        self.params = jax.tree.map(jnp.asarray, ckpt.load_pytree(
            path, {"steer": self.params["steer"],
                   "throttle": self.params["throttle"]}))
        if include_opt:
            import os

            if os.path.exists(path + ".opt"):
                self.opt_state = jax.tree.map(jnp.asarray, ckpt.load_pytree(
                    path + ".opt", self.opt_state))


class EnsembleAgent:
    """K-checkpoint ensemble as a vmap axis (replaces eval.py's K sequential
    agents; SURVEY §2.7 'ensemble parallelism'). Accepts our .msgpack
    snapshots and reference ppo_model_{N}.pt files interchangeably."""

    @staticmethod
    def _load(path: str, agent: CadreAgent):
        if path.endswith((".pt", ".pth")):
            params, missing = ckpt.load_policy_pt(
                path, agent.params["steer"], agent.params["throttle"],
                agent.agent_cfg.command_num)
            return params
        return ckpt.load_pytree(path, agent.params)

    def __init__(self, agent: CadreAgent, snapshot_paths):
        banks = [self._load(p, agent) for p in snapshot_paths]
        self.k = len(banks)
        self.stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *banks)
        self.agent = agent
        self._act_k = jax.jit(jax.vmap(
            agent._act, in_axes=(0, None, None, None, None, None, None, 0)))

    def act(self, tick_data, rng) -> list:
        rngs = jax.random.split(rng, self.k)
        out = self._act_k(
            self.stacked, self.agent.danet_vars,
            jnp.asarray(tick_data["rgb"]), jnp.asarray(tick_data["route_fig"]),
            jnp.asarray(tick_data["measurements"]),
            jnp.asarray(tick_data["command"], jnp.int32),
            self.agent.hidden_state, rngs)
        # ONE host round trip for all K members (2K int() fetches would pay
        # 2K tunnel round trips per tick)
        sa, ta = jax.device_get((out.steer_action, out.throttle_action))
        return [(int(sa[i]), int(ta[i])) for i in range(self.k)]
