"""DANet multi-task attention perception encoder ("CoPM"), TPU-native.

Behavioral contract from the reference (all citations relative to
carla_perception/ in BIT-MCS/Cadre):
  - DANetHead: parallel position-attention + channel-attention branches over
    the ResNet18 5x8x512 feature map, summed, 1x1 projected
    (Networks/danet.py:17-69).
  - InterTaskAtt 'transformer': per-task q/k/v MLPs (flatten -> inter_att_dims
    -> z_dims), single-token z x z cross attention visual<->bc with dropout,
    residual on v (Networks/danet_blocks/intertask_att.py:121-176). Also the
    'position' and 'invaild' ablation modes (:178-226).
  - VisualBranch: z -> FC -> [B,5,8,512] -> 5 ConvTranspose stages to 144x256
    with output_padding (0,1) on the first stage (visual_branch.py:141-163);
    light-state classifier MLP from the reverse feature (:121-129).
  - BCBranch: z -> z/2 -> 2 (bc_branch.py:55-60).
  - get_latent_feature(x, "concate") -> concat(visual_z, bc_z) = [B, 2*z]
    (danet.py:216-238).

TPU-first design: NHWC layout throughout; PAM/CAM math lives in
`cadre_tpu.ops.dual_attention` (with a fused Pallas path); everything is a
pure function of params suitable for jit/pjit/vmap.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cadre_tpu.configs.danet_config import DANetParams
from cadre_tpu.models.resnet import ResNetBackbone
from cadre_tpu.models.torch_compat import (
    ConvTransposeTorch,
    batch_norm,
    conv,
    flatten_nchw,
    leaky_relu,
    unflatten_nchw,
)
from cadre_tpu.ops.dual_attention import cam_apply, fused_dual_attention, pam_apply


class PositionAttention(nn.Module):
    """PAM (da_att.py:19-51): 1x1 q/k at C/8, v at C, gamma-gated residual."""

    dim: int
    axis_name: str | None = None

    def setup(self):
        self.query_conv = conv(self.dim // 8, 1)
        self.key_conv = conv(self.dim // 8, 1)
        self.value_conv = conv(self.dim, 1)
        self.gamma = self.param("gamma", nn.initializers.zeros, (1,))

    def projections(self, x):
        return (self.query_conv(x), self.key_conv(x), self.value_conv(x),
                self.gamma)

    def __call__(self, x):
        q, k, v, gamma = self.projections(x)
        return pam_apply(x, q, k, v, gamma)


class ChannelAttention(nn.Module):
    """CAM (da_att.py:54-83): parameter-free gram attention, gamma residual."""

    def setup(self):
        self.gamma = self.param("gamma", nn.initializers.zeros, (1,))

    def __call__(self, x):
        return cam_apply(x, self.gamma)


class DANetHead(nn.Module):
    """Dual-attention head (danet.py:17-69).

    conv5a -> PAM -> conv51  and  conv5c -> CAM -> conv52, summed, then
    dropout2d(0.1) + 1x1 conv to `out_channels`.
    """

    out_channels: int
    axis_name: str | None = None
    # True | False | "auto". As of the late round-2 re-measurement the XLA
    # einsum path (preferred_element_type=f32) beats the fused Pallas kernel
    # at the production batch-256 5x8x128 bf16 shape — 0.555 vs 0.689
    # ms/iter op-level, 35.0k vs 34.5k frames/s end-to-end — so "auto" now
    # resolves to the XLA path everywhere; the kernel stays available behind
    # an explicit True for re-evaluation on other chips (see BENCH_NOTES.md).
    use_fused_attention: Any = "auto"

    def _resolve_fused(self, feat) -> bool:
        if self.use_fused_attention != "auto":
            return bool(self.use_fused_attention)
        return False

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = x.shape[-1] // 4

        feat1 = conv(inter, 3, 1, 1, use_bias=False, name="conv5a_conv")(x)
        feat1 = batch_norm(train, "conv5a_bn", self.axis_name)(feat1)
        feat1 = nn.relu(feat1)

        feat2 = conv(inter, 3, 1, 1, use_bias=False, name="conv5c_conv")(x)
        feat2 = batch_norm(train, "conv5c_bn", self.axis_name)(feat2)
        feat2 = nn.relu(feat2)

        sa_mod = PositionAttention(inter, name="sa")
        sc_mod = ChannelAttention(name="sc")
        if self._resolve_fused(feat1):
            q, k, v, g_p = sa_mod.projections(feat1)
            g_c = sc_mod.gamma
            sa, sc = fused_dual_attention(feat1, q, k, v, g_p, feat2, g_c)
        else:
            sa = sa_mod(feat1)
            sc = sc_mod(feat2)

        sa = conv(inter, 3, 1, 1, use_bias=False, name="conv51_conv")(sa)
        sa = batch_norm(train, "conv51_bn", self.axis_name)(sa)
        sa = nn.relu(sa)

        sc = conv(inter, 3, 1, 1, use_bias=False, name="conv52_conv")(sc)
        sc = batch_norm(train, "conv52_bn", self.axis_name)(sc)
        sc = nn.relu(sc)

        feat_sum = sa + sc
        # torch Dropout2d(0.1) drops whole channels (danet.py:41)
        if train:
            keep = 0.9
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep,
                                        (feat_sum.shape[0], 1, 1,
                                         feat_sum.shape[-1]))
            feat_sum = feat_sum * mask / keep
        return conv(self.out_channels, 1, name="conv8_conv")(feat_sum)


class _QKVMlp(nn.Module):
    """Flatten -> Linear(inter_att_dims) -> LeakyReLU -> Linear(z_dims)."""

    inter_dims: int
    z_dims: int

    @nn.compact
    def __call__(self, x_flat):
        h = nn.Dense(self.inter_dims, name="fc1")(x_flat)
        h = leaky_relu(h)
        return nn.Dense(self.z_dims, name="fc2")(h)


class InterTaskAtt(nn.Module):
    """Cross-task attention between visual and BC streams (intertask_att.py).

    'transformer' (production): z x z single-token cross attention with
    temperature sqrt(z), attention dropout 0.1, residual on v.
    'position': spatial HW x HW cross attention with gamma residual.
    'invaild': plain value MLPs, no attention ("CoPM w/o att" ablation).
    """

    params_cfg: DANetParams

    @nn.compact
    def __call__(self, da_visual_x, da_bc_x, train: bool = False):
        cfg = self.params_cfg
        att_type = cfg.att_type
        z = cfg.z_dims

        if att_type == "transformer":
            vx = flatten_nchw(da_visual_x)
            bx = flatten_nchw(da_bc_x)
            temp = z ** 0.5

            vq = _QKVMlp(cfg.inter_att_dims, z, name="visual_query")(vx)
            vk = _QKVMlp(cfg.inter_att_dims, z, name="visual_key")(vx)
            vv = _QKVMlp(cfg.inter_att_dims, z, name="visual_value")(vx)
            bq = _QKVMlp(cfg.inter_att_dims, z, name="bc_query")(bx)
            bk = _QKVMlp(cfg.inter_att_dims, z, name="bc_key")(bx)
            bv = _QKVMlp(cfg.inter_att_dims, z, name="bc_value")(bx)

            def cross(q, k, v):
                # energy[i,j] = q_i k_j / temp; att = softmax_j; out_i = att@v
                energy = jnp.einsum("bi,bj->bij", q / temp, k)
                att = jax.nn.softmax(energy, axis=-1)
                if train:
                    rng = self.make_rng("dropout")
                    att = jnp.where(
                        jax.random.bernoulli(rng, 0.9, att.shape), att / 0.9, 0.0
                    )
                return jnp.einsum("bij,bj->bi", att, v) + v

            att_bc = cross(vq, bk, bv)
            att_visual = cross(bq, vk, vv)
            return att_visual, att_bc

        if att_type == "position":
            b, h, w, c = da_visual_x.shape
            p = h * w

            def proj(x, name):
                return conv(c, 1, name=name)(x).reshape(b, p, c)

            vq = proj(da_visual_x, "visual_query")
            vk = proj(da_visual_x, "visual_key")
            vv = proj(da_visual_x, "visual_value")
            bq = proj(da_bc_x, "bc_query")
            bk = proj(da_bc_x, "bc_key")
            bv = proj(da_bc_x, "bc_value")
            g_v = self.param("visual_gamma", nn.initializers.zeros, (1,))
            g_b = self.param("bc_gamma", nn.initializers.zeros, (1,))

            def cross(q, k, v, gamma, res):
                energy = jnp.einsum("bpc,bqc->bpq", q, k)
                att = jax.nn.softmax(energy, axis=-1)
                out = jnp.einsum("bpq,bqc->bpc", att, v).reshape(b, h, w, c)
                return gamma * out + res

            att_bc = cross(vq, bk, bv, g_b, da_bc_x)
            att_visual = cross(bq, vk, vv, g_v, da_visual_x)
            return att_visual, att_bc

        if att_type == "invaild":
            vx = flatten_nchw(da_visual_x)
            bx = flatten_nchw(da_bc_x)
            att_visual = _QKVMlp(cfg.inter_att_dims, z, name="visual_value")(vx)
            att_bc = _QKVMlp(cfg.inter_att_dims, z, name="bc_value")(bx)
            return att_visual, att_bc

        raise ValueError(f"unknown att_type {att_type!r}")


def _stage_sizes(target: int, n_stages: int):
    """Spatial size after each transposed-conv stage, back-computed from the
    target (ceil-division chain). For target 144: [9, 18, 36, 72, 144] — which
    yields the reference's output_padding (0,1) first-stage quirk
    (visual_branch.py:146-152) as the general rule op = out - (2*in - 1).
    """
    sizes = []
    s = target
    for _ in range(n_stages):
        sizes.append(s)
        s = -(-s // 2)  # ceil
    return sizes[::-1]


class ReverseDecoder(nn.Module):
    """One ConvTranspose pyramid: [B,5,8,512] -> [B,144,256,out].

    Stage channel schedule 512->256->128->64->32->out with per-stage
    output_padding derived from the target size (visual_branch.py:141-163).
    """

    out_channels: int
    target_hw: tuple = (144, 256)
    use_sigmoid: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = (512, 256, 128, 64, 32)
        n = len(dims)  # 5 upsampling stages total (4 hidden + 1 out)
        hs = _stage_sizes(self.target_hw[0], n)
        ws = _stage_sizes(self.target_hw[1], n)

        in_h, in_w = x.shape[1], x.shape[2]

        def opad(i):
            h_in = hs[i - 1] if i > 0 else in_h
            w_in = ws[i - 1] if i > 0 else in_w
            return (hs[i] - (2 * h_in - 1), ws[i] - (2 * w_in - 1))

        for i in range(n - 1):
            x = ConvTransposeTorch(dims[i + 1], output_padding=opad(i),
                                   name=f"up{i}_conv")(x)
            x = batch_norm(train, f"up{i}_bn", self.axis_name)(x)
            x = leaky_relu(x)
        x = ConvTransposeTorch(self.out_channels, output_padding=opad(n - 1),
                               name="out_conv")(x)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        return x


class VisualBranch(nn.Module):
    """Decoder bank gated by pred_* flags (visual_branch.py:37-212)."""

    params_cfg: DANetParams
    axis_name: str | None = None

    @nn.compact
    def __call__(self, z, train: bool = False):
        cfg = self.params_cfg
        # reverse_feature: z -> 512 -> 512*5*8, reshaped NCHW-order
        h = nn.Dense(512, name="reverse_feature_fc1")(z)
        h = leaky_relu(h)
        h = nn.Dense(512 * cfg.feat_h * cfg.feat_w, name="reverse_feature_fc2")(h)
        feat = unflatten_nchw(h, 512, cfg.feat_h, cfg.feat_w)

        hw = (cfg.image_height, cfg.image_width)
        out: Dict[str, Any] = {}
        out["camera"] = ReverseDecoder(
            cfg.camera_output_channel,
            target_hw=hw,
            use_sigmoid=not cfg.pred_camera_seg,
            axis_name=self.axis_name,
            name="reverse_image",
        )(feat, train=train)

        if cfg.pred_left_camera_seg:
            out["left_camera"] = ReverseDecoder(
                cfg.left_camera_output_channel, target_hw=hw,
                axis_name=self.axis_name,
                name="reverse_left_image")(feat, train=train)
        if cfg.pred_right_camera_seg:
            out["right_camera"] = ReverseDecoder(
                cfg.right_camera_output_channel, target_hw=hw,
                axis_name=self.axis_name,
                name="reverse_right_image")(feat, train=train)
        if cfg.pred_route:
            out["route"] = ReverseDecoder(
                1, target_hw=hw, use_sigmoid=True, axis_name=self.axis_name,
                name="reverse_route")(feat, train=train)
        if cfg.pred_lidar:
            out["lidar"] = ReverseDecoder(
                3, target_hw=hw, axis_name=self.axis_name,
                name="reverse_lidar")(feat, train=train)
        if cfg.pred_topdown_rgb:
            out["topdown"] = ReverseDecoder(
                3, target_hw=hw, axis_name=self.axis_name,
                name="reverse_topdown_rgb")(feat, train=train)
        if cfg.pred_topdown_seg:
            out["topdown"] = ReverseDecoder(
                1, target_hw=hw, axis_name=self.axis_name,
                name="reverse_topdown_seg")(feat, train=train)

        feat_flat = flatten_nchw(feat)
        if cfg.pred_light_state:
            h = nn.Dense(256, name="reverse_lightState_fc1")(feat_flat)
            h = leaky_relu(h)
            h = nn.Dense(64, name="reverse_lightState_fc2")(h)
            h = leaky_relu(h)
            out["light_state"] = nn.Dense(
                cfg.light_classes_num, name="reverse_lightState_fc3")(h)
        if cfg.pred_light_dist:
            h = nn.Dense(256, name="reverse_lightDist_fc1")(feat_flat)
            h = leaky_relu(h)
            h = nn.Dense(64, name="reverse_lightDist_fc2")(h)
            h = leaky_relu(h)
            out["light_dist"] = nn.Dense(1, name="reverse_lightDist_fc3")(h)
        return out


class BCBranch(nn.Module):
    """z -> z/2 -> 2 (steer, throttle) (bc_branch.py:55-60)."""

    z_dims: int

    @nn.compact
    def __call__(self, z):
        h = nn.Dense(self.z_dims // 2, name="fc1")(z)
        h = leaky_relu(h)
        return nn.Dense(2, name="fc2")(h)


class RouteGeomBranch(nn.Module):
    """Latent -> (dis, theta) auxiliary head (TPU-framework extension).

    Consumes the SAME latent `DANet.latent(mode='concate')` hands to PPO
    (concat of att_visual ++ att_bc, pre speed-feature), so its gradients
    force route geometry to survive the bottleneck the policy reads.
    See DANetParams.pred_route_geom for the motivation.
    """

    z_dims: int

    @nn.compact
    def __call__(self, z):
        h = nn.Dense(self.z_dims // 2, name="fc1")(z)
        h = leaky_relu(h)
        return nn.Dense(2, name="fc2")(h)


class DANet(nn.Module):
    """The full CoPM encoder-decoder (Networks/danet.py:72-364)."""

    params_cfg: DANetParams
    axis_name: str | None = None

    def setup(self):
        cfg = self.params_cfg
        self.backbone = ResNetBackbone(arch=cfg.backbone,
                                       axis_name=self.axis_name,
                                       name="backbone")
        self.da_head = DANetHead(cfg.da_feature_channel,
                                 axis_name=self.axis_name,
                                 use_fused_attention=cfg.use_fused_attention,
                                 name="da_head")
        self.visual_conv = conv(cfg.da_feature_channel, 1, name="visual_conv")
        self.visual_branch = VisualBranch(cfg, axis_name=self.axis_name,
                                          name="visual_branch")
        if cfg.pred_bc:
            self.bc_conv = conv(cfg.da_feature_channel, 1, name="bc_conv")
            self.inter_task_att = InterTaskAtt(cfg, name="inter_task_att")
            self.bc_branch = BCBranch(cfg.z_dims, name="bc_branch")
            if cfg.in_bc_speed:
                self.in_bc_speed_fc1 = nn.Dense(64, name="in_bc_speed_fc1")
                self.in_bc_speed_fc2 = nn.Dense(cfg.z_dims,
                                                name="in_bc_speed_fc2")
        else:
            self.visual_fc1 = nn.Dense(1024, name="visual_fc1")
            self.visual_fc2 = nn.Dense(cfg.z_dims, name="visual_fc2")
        if cfg.pred_route_geom:
            self.route_geom_branch = RouteGeomBranch(
                cfg.z_dims, name="route_geom_branch")

    def _trunk(self, x, train: bool):
        """backbone -> dual-attention head -> per-task 1x1 convs."""
        layer4 = self.backbone(x, train=train)
        da_att = self.da_head(layer4, train=train)
        da_visual = self.visual_conv(da_att)
        da_bc = self.bc_conv(da_att) if self.params_cfg.pred_bc else None
        return da_visual, da_bc

    def _zs(self, da_visual, da_bc, train: bool):
        cfg = self.params_cfg
        if cfg.pred_bc:
            return self.inter_task_att(da_visual, da_bc, train=train)
        z = self.visual_fc2(leaky_relu(self.visual_fc1(flatten_nchw(da_visual))))
        return z, None

    def _speed_feature(self, bc_speed):
        h = leaky_relu(self.in_bc_speed_fc1(bc_speed.reshape(-1, 1)))
        return self.in_bc_speed_fc2(h)

    def __call__(self, x, bc_speed=None, train: bool = False):
        """Full multi-task forward (danet.py:164-210). Returns a dict."""
        cfg = self.params_cfg
        da_visual, da_bc = self._trunk(x, train)
        att_visual, att_bc = self._zs(da_visual, da_bc, train)
        if cfg.pred_route_geom:
            # pre-speed concat == latent(mode='concate'), the PPO view
            z_ppo = (jnp.concatenate([att_visual, att_bc], axis=-1)
                     if cfg.pred_bc else att_visual)
            geom = self.route_geom_branch(z_ppo)
        if cfg.pred_bc and cfg.in_bc_speed and bc_speed is not None:
            att_bc = att_bc + self._speed_feature(bc_speed)
        out = self.visual_branch(att_visual, train=train)
        if cfg.pred_bc:
            bc = self.bc_branch(att_bc)
            out["steer"] = bc[:, 0]
            out["throttle"] = bc[:, 1]
        if cfg.pred_route_geom:
            out["route_geom"] = geom            # [B, 2] = (dis, theta)
        return out

    def latent(self, x, mode: str = "concate", train: bool = False):
        """PPO latent (danet.py:216-238): [B, 2*z] for 'concate'."""
        cfg = self.params_cfg
        da_visual, da_bc = self._trunk(x, train)
        att_visual, att_bc = self._zs(da_visual, da_bc, train)
        if not cfg.pred_bc:
            return att_visual
        if mode == "add":
            return att_visual + att_bc
        return jnp.concatenate([att_visual, att_bc], axis=-1)

    def bc_actions(self, x, bc_speed=None, train: bool = False):
        """(steer, throttle) BC head only (danet.py:240-265)."""
        cfg = self.params_cfg
        da_visual, da_bc = self._trunk(x, train)
        att_visual, att_bc = self._zs(da_visual, da_bc, train)
        if cfg.in_bc_speed and bc_speed is not None:
            att_bc = att_bc + self._speed_feature(bc_speed)
        bc = self.bc_branch(att_bc)
        return bc[:, 0], bc[:, 1]


def create_danet(cfg: DANetParams, rng: jax.Array, *,
                 train: bool = False, axis_name: str | None = None):
    """Initialize a DANet and return (module, variables)."""
    model = DANet(params_cfg=cfg, axis_name=axis_name)
    x = jnp.zeros((1, cfg.image_height, cfg.image_width, cfg.input_channel),
                  jnp.float32)
    speed = jnp.zeros((1, 1), jnp.float32) if cfg.in_bc_speed else None
    rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    variables = model.init(rngs, x, speed, train=train)
    return model, variables
