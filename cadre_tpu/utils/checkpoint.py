"""Checkpoint I/O: flax msgpack pytrees + a torch .pt -> flax importer.

Replaces the reference's torch.save snapshot machinery (ppo_agent/agent.py:
245-271; carla_perception/Models/experiments_builder.py:442-515). Policy/
perception checkpoints are flax-serialized pytrees; `import_danet_torch`
converts a reference-format PyTorch DANet state_dict into our NHWC flax
variable tree so public checkpoints reproduce logits (BASELINE north star).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def load_pytree(path: str, like: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(like, f.read())


# --------------------- torch DANet checkpoint import ---------------------

def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _conv_w(sd, key):
    """torch Conv2d weight [O,I,kh,kw] -> HWIO."""
    return jnp.asarray(_t(sd[key]).transpose(2, 3, 1, 0))


def _convT_w(sd, key):
    """torch ConvTranspose2d weight [I,O,kh,kw] -> HWIO (flip done at apply)."""
    return jnp.asarray(_t(sd[key]).transpose(2, 3, 0, 1))


def _dense(sd, key_w, key_b=None, permute_chw=None):
    """torch Linear weight [O,I] -> flax kernel [I,O].

    permute_chw=(C,H,W): the torch layer consumed an NCHW-flattened input;
    our flax layer consumes NHWC-flattened. Permute the input axis to match.
    """
    w = _t(sd[key_w])  # [O, I]
    if permute_chw is not None:
        c, h, wd = permute_chw
        w = w.reshape(-1, c, h, wd).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    out = {"kernel": jnp.asarray(w.T)}
    if key_b is not None:
        out["bias"] = jnp.asarray(_t(sd[key_b]))
    return out


def _bn(sd, prefix):
    return (
        {"scale": jnp.asarray(_t(sd[prefix + ".weight"])),
         "bias": jnp.asarray(_t(sd[prefix + ".bias"]))},
        {"mean": jnp.asarray(_t(sd[prefix + ".running_mean"])),
         "var": jnp.asarray(_t(sd[prefix + ".running_var"]))},
    )


def import_danet_torch(state_dict: Dict[str, Any], cfg,
                       flat_chw=None) -> Dict[str, Any]:
    """Convert a reference-format torch DANet state_dict to flax variables.

    `state_dict` keys follow carla_perception/Networks/danet.py module names
    (backbone.*, da_head.*, visual_conv.*, bc_conv.*, inter_task_att.*,
    visual_branch.*, bc_branch.*, in_bc_speed_fc.*).

    Returns {'params': ..., 'batch_stats': ...} matching cadre_tpu DANet.
    """
    sd = state_dict
    chw = flat_chw or (cfg.da_feature_channel, cfg.feat_h, cfg.feat_w)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # ---- backbone ----
    bb_p: Dict[str, Any] = {}
    bb_s: Dict[str, Any] = {}
    bb_p["conv1"] = {"kernel": _conv_w(sd, "backbone.conv1.weight"),
                     "bias": jnp.asarray(_t(sd["backbone.conv1.bias"]))}
    bb_p["bn1"], bb_s["bn1"] = _bn(sd, "backbone.bn1")
    from cadre_tpu.models.resnet import RESNET_SPECS

    _, layers, _ = RESNET_SPECS[cfg.backbone]
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            tp = f"backbone.layer{stage + 1}.{b}"
            name = f"layer{stage + 1}_{b}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            blk_p["conv1"] = {"kernel": _conv_w(sd, tp + ".conv1.weight")}
            blk_p["bn1"], blk_s["bn1"] = _bn(sd, tp + ".bn1")
            blk_p["conv2"] = {"kernel": _conv_w(sd, tp + ".conv2.weight")}
            blk_p["bn2"], blk_s["bn2"] = _bn(sd, tp + ".bn2")
            if tp + ".downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": _conv_w(sd, tp + ".downsample.0.weight")}
                blk_p["downsample_bn"], blk_s["downsample_bn"] = _bn(
                    sd, tp + ".downsample.1")
            bb_p[name] = blk_p
            bb_s[name] = blk_s
    params["backbone"] = bb_p
    stats["backbone"] = bb_s

    # ---- da_head ----
    dh_p: Dict[str, Any] = {}
    dh_s: Dict[str, Any] = {}
    for ours, theirs in [("conv5a", "da_head.conv5a"),
                         ("conv5c", "da_head.conv5c"),
                         ("conv51", "da_head.conv51"),
                         ("conv52", "da_head.conv52")]:
        dh_p[ours + "_conv"] = {"kernel": _conv_w(sd, theirs + ".0.weight")}
        dh_p[ours + "_bn"], dh_s[ours + "_bn"] = _bn(sd, theirs + ".1")
    dh_p["sa"] = {
        "query_conv": {"kernel": _conv_w(sd, "da_head.sa.query_conv.weight"),
                       "bias": jnp.asarray(_t(sd["da_head.sa.query_conv.bias"]))},
        "key_conv": {"kernel": _conv_w(sd, "da_head.sa.key_conv.weight"),
                     "bias": jnp.asarray(_t(sd["da_head.sa.key_conv.bias"]))},
        "value_conv": {"kernel": _conv_w(sd, "da_head.sa.value_conv.weight"),
                       "bias": jnp.asarray(_t(sd["da_head.sa.value_conv.bias"]))},
        "gamma": jnp.asarray(_t(sd["da_head.sa.gamma"])),
    }
    dh_p["sc"] = {"gamma": jnp.asarray(_t(sd["da_head.sc.gamma"]))}
    dh_p["conv8_conv"] = {"kernel": _conv_w(sd, "da_head.conv8.1.weight"),
                          "bias": jnp.asarray(_t(sd["da_head.conv8.1.bias"]))}
    params["da_head"] = dh_p
    stats["da_head"] = dh_s

    # ---- per-task 1x1 convs ----
    params["visual_conv"] = {"kernel": _conv_w(sd, "visual_conv.weight"),
                             "bias": jnp.asarray(_t(sd["visual_conv.bias"]))}
    if cfg.pred_bc:
        params["bc_conv"] = {"kernel": _conv_w(sd, "bc_conv.weight"),
                             "bias": jnp.asarray(_t(sd["bc_conv.bias"]))}

        # ---- inter-task attention (transformer mode MLPs) ----
        ita: Dict[str, Any] = {}
        for ours, theirs in [("visual_query", "inter_task_att.visual_query_layer"),
                             ("visual_key", "inter_task_att.visual_key_layer"),
                             ("visual_value", "inter_task_att.visual_value_layer"),
                             ("bc_query", "inter_task_att.bc_query_layer"),
                             ("bc_key", "inter_task_att.bc_key_layer"),
                             ("bc_value", "inter_task_att.bc_value_layer")]:
            # our flatten_nchw preserves torch CHW element order -> no permute
            ita[ours] = {
                "fc1": _dense(sd, theirs + ".1.weight", theirs + ".1.bias"),
                "fc2": _dense(sd, theirs + ".3.weight", theirs + ".3.bias"),
            }
        params["inter_task_att"] = ita

        params["bc_branch"] = {
            "fc1": _dense(sd, "bc_branch.bc_model.1.weight",
                          "bc_branch.bc_model.1.bias"),
            "fc2": _dense(sd, "bc_branch.bc_model.3.weight",
                          "bc_branch.bc_model.3.bias"),
        }
        if cfg.in_bc_speed and "in_bc_speed_fc.1.weight" in sd:
            params["in_bc_speed_fc1"] = _dense(sd, "in_bc_speed_fc.1.weight",
                                               "in_bc_speed_fc.1.bias")
            params["in_bc_speed_fc2"] = _dense(sd, "in_bc_speed_fc.3.weight",
                                               "in_bc_speed_fc.3.bias")

    # ---- visual branch ----
    vb_p: Dict[str, Any] = {}
    vb_s: Dict[str, Any] = {}
    vb_p["reverse_feature_fc1"] = _dense(sd, "visual_branch.reverse_feature.0.weight",
                                         "visual_branch.reverse_feature.0.bias")
    vb_p["reverse_feature_fc2"] = _dense(sd, "visual_branch.reverse_feature.2.weight",
                                         "visual_branch.reverse_feature.2.bias")

    def import_decoder(torch_prefix):
        dec_p: Dict[str, Any] = {}
        dec_s: Dict[str, Any] = {}
        # torch Sequential: stages at indices 0,3,6,9 (convT) with BN at 1,4,..
        for i in range(4):
            ci = 3 * i
            dec_p[f"up{i}_conv"] = {
                "kernel": _convT_w(sd, f"{torch_prefix}.{ci}.weight"),
                "bias": jnp.asarray(_t(sd[f"{torch_prefix}.{ci}.bias"]))}
            dec_p[f"up{i}_bn"], dec_s[f"up{i}_bn"] = _bn(
                sd, f"{torch_prefix}.{ci + 1}")
        dec_p["out_conv"] = {
            "kernel": _convT_w(sd, f"{torch_prefix}.12.weight"),
            "bias": jnp.asarray(_t(sd[f"{torch_prefix}.12.bias"]))}
        return dec_p, dec_s

    if "visual_branch.reverse_image.0.weight" in sd:
        vb_p["reverse_image"], vb_s["reverse_image"] = import_decoder(
            "visual_branch.reverse_image")
    if cfg.pred_route and "visual_branch.reverse_route.0.weight" in sd:
        vb_p["reverse_route"], vb_s["reverse_route"] = import_decoder(
            "visual_branch.reverse_route")
    if cfg.pred_light_state and "visual_branch.reverse_lightState.1.weight" in sd:
        vb_p["reverse_lightState_fc1"] = _dense(
            sd, "visual_branch.reverse_lightState.1.weight",
            "visual_branch.reverse_lightState.1.bias")
        vb_p["reverse_lightState_fc2"] = _dense(
            sd, "visual_branch.reverse_lightState.3.weight",
            "visual_branch.reverse_lightState.3.bias")
        vb_p["reverse_lightState_fc3"] = _dense(
            sd, "visual_branch.reverse_lightState.5.weight",
            "visual_branch.reverse_lightState.5.bias")
    params["visual_branch"] = vb_p
    stats["visual_branch"] = vb_s

    return {"params": params, "batch_stats": stats}


def load_danet_pt(path: str, cfg, key: str = "autoencoder"):
    """Load a reference .pt perception checkpoint (ppo_agent/models.py:54-63)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob[key] if isinstance(blob, dict) and key in blob else blob
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_danet_torch(sd, cfg)


def import_policy_torch(snapshot: Dict[str, Any], steer_params,
                        throttle_params, num_commands: int = 4):
    """Convert a reference RL snapshot (ppo_agent/agent.py:245-260 format:
    '{steer,throttle}_{ppo,lstm}_{k}' torch modules/state_dicts) into our
    stacked command-bank params.

    Banks missing from the snapshot are left at their current values — the
    reference's own save_snapshot omits throttle_lstm and double-saves
    steer_ppo (agent.py:247-258), so round-tripping its real checkpoints
    requires tolerating absences. Returns ({'steer':..., 'throttle':...},
    missing_keys).
    """
    def to_sd(mod):
        return mod.state_dict() if hasattr(mod, "state_dict") else mod

    def ac_params(sd):
        return {
            "control": {
                "fc1": _dense(sd, "control.linear.0.weight",
                              "control.linear.0.bias"),
                "fc2": _dense(sd, "control.linear.2.weight",
                              "control.linear.2.bias"),
                "fc3": _dense(sd, "control.linear.4.weight",
                              "control.linear.4.bias"),
            },
            "critic_fc1": _dense(sd, "critic.0.weight", "critic.0.bias"),
            "critic_fc2": _dense(sd, "critic.2.weight", "critic.2.bias"),
            "critic_fc3": _dense(sd, "critic.4.weight", "critic.4.bias"),
        }

    def lstm_params(sd):
        return {"rnn": {
            "weight_ih": jnp.asarray(_t(sd["rnn.weight_ih"])),
            "weight_hh": jnp.asarray(_t(sd["rnn.weight_hh"])),
            "bias_ih": jnp.asarray(_t(sd["rnn.bias_ih"])),
            "bias_hh": jnp.asarray(_t(sd["rnn.bias_hh"])),
        }}

    missing = []
    out = {"steer": jax.tree.map(lambda x: np.array(x), steer_params),
           "throttle": jax.tree.map(lambda x: np.array(x), throttle_params)}

    def set_bank(signal, kind, k, tree):
        bank = out[signal][kind] if kind in out[signal] else None
        # stacked layout: out[signal]['ac'|'lstm'][...][k]
        def assign(dst, src):
            for key, val in src.items():
                if isinstance(val, dict):
                    assign(dst[key], val)
                else:
                    dst[key][k] = np.asarray(val)

        assign(out[signal][kind], tree)

    for signal in ("steer", "throttle"):
        for k in range(num_commands):
            ppo_key = f"{signal}_ppo_{k}"
            lstm_key = f"{signal}_lstm_{k}"
            if ppo_key in snapshot:
                set_bank(signal, "ac", k, ac_params(to_sd(snapshot[ppo_key])))
            else:
                missing.append(ppo_key)
            if lstm_key in snapshot:
                set_bank(signal, "lstm", k,
                         lstm_params(to_sd(snapshot[lstm_key])))
            else:
                missing.append(lstm_key)
    out = jax.tree.map(jnp.asarray, out)
    return out, missing


def load_policy_pt(path: str, steer_params, throttle_params,
                   num_commands: int = 4):
    """Load a reference ppo_model_{N}.pt snapshot into stacked banks."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    return import_policy_torch(blob, steer_params, throttle_params,
                               num_commands)


def load_danet_checkpoint(path: str, cfg):
    """Format-sniffing loader: torch .pt (reference format) or flax .msgpack
    (PerceptionTrainer output). Returns DANet variables."""
    if path.endswith((".pt", ".pth")):
        return load_danet_pt(path, cfg)
    import jax

    from cadre_tpu.models.danet import create_danet

    _, like = create_danet(cfg, jax.random.PRNGKey(0))
    tree = load_pytree(path, {"params": like["params"],
                              "batch_stats": like.get("batch_stats", {})})
    return {"params": tree["params"], "batch_stats": tree["batch_stats"]}
