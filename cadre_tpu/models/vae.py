"""VAE-family perception ablations.

Reference family (carla_perception/Networks/):
  - VanillaVAE (vanilla_vae.py:38+): conv pyramid encoder (hidden dims
    64-512, stride-2 3x3 conv+BN+LeakyReLU) -> fc mu (+ logvar, unused for
    the 'vanilla' forward) -> decoder bank like DANet's VisualBranch.
  - BetaVAE (beta_vae.py:38+): same with reparameterized z and beta-weighted
    KLD (the beta weighting lives in the loss, perception/losses.kld_loss).
  - DABetaVAE (da_beta_vae.py:71+): the DANet trunk with reparameterized
    mu/logvar heads per task stream.
All share the multi-head decoder contract, so they plug into the same
perception trainer and RL latent interface.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cadre_tpu.configs.danet_config import DANetParams
from cadre_tpu.models.danet import VisualBranch, BCBranch, DANetHead
from cadre_tpu.models.resnet import ResNetBackbone
from cadre_tpu.models.torch_compat import (
    ConvTransposeTorch,
    batch_norm,
    conv,
    flatten_nchw,
    leaky_relu,
    unflatten_nchw,
)


class ConvEncoder(nn.Module):
    """Stride-2 conv pyramid: [B,H,W,Cin] -> [B,H/16,W/16,512]."""

    hidden_dims: Tuple[int, ...] = (64, 128, 256, 512)
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, h in enumerate(self.hidden_dims):
            x = conv(h, 3, 2, 1, use_bias=False, name=f"enc{i}_conv")(x)
            x = batch_norm(train, f"enc{i}_bn", self.axis_name)(x)
            x = leaky_relu(x)
        return x


class VanillaVAE(nn.Module):
    """Autoencoder with gaussian latent heads (vanilla_vae.py)."""

    params_cfg: DANetParams
    variational: bool = False   # True => BetaVAE behavior (reparameterize)

    def setup(self):
        cfg = self.params_cfg
        self.encoder = ConvEncoder(name="encoder")
        self.fc_mu_1 = nn.Dense(512, name="fc_mu_1")
        self.fc_mu_2 = nn.Dense(cfg.z_dims, name="fc_mu_2")
        self.fc_var_1 = nn.Dense(512, name="fc_var_1")
        self.fc_var_2 = nn.Dense(cfg.z_dims, name="fc_var_2")
        self.visual_branch = VisualBranch(cfg, name="visual_branch")
        if cfg.pred_bc:
            self.bc_branch = BCBranch(cfg.z_dims, name="bc_branch")

    def encode(self, x, train: bool = False):
        h = flatten_nchw(self.encoder(x, train=train))
        mu = self.fc_mu_2(leaky_relu(self.fc_mu_1(h)))
        logvar = self.fc_var_2(leaky_relu(self.fc_var_1(h)))
        return mu, logvar

    def __call__(self, x, train: bool = False, rng: Optional[jax.Array] = None):
        mu, logvar = self.encode(x, train=train)
        if self.variational and rng is not None:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mu.shape, mu.dtype)
        else:
            z = mu
        out = self.visual_branch(z, train=train)
        out["mu"] = mu
        out["logvar"] = logvar
        if self.params_cfg.pred_bc:
            bc = self.bc_branch(z)
            out["steer"] = bc[:, 0]
            out["throttle"] = bc[:, 1]
        return out

    def latent(self, x, train: bool = False):
        mu, _ = self.encode(x, train=train)
        return mu


class BetaVAE(VanillaVAE):
    """Reparameterized variant; beta weighting applied in the loss."""

    variational: bool = True


class DABetaVAE(nn.Module):
    """DANet trunk with reparameterized per-stream latents
    (da_beta_vae.py:71-260)."""

    params_cfg: DANetParams
    axis_name: str | None = None

    def setup(self):
        cfg = self.params_cfg
        self.backbone = ResNetBackbone(arch=cfg.backbone,
                                       axis_name=self.axis_name,
                                       name="backbone")
        self.da_head = DANetHead(cfg.da_feature_channel,
                                 axis_name=self.axis_name, name="da_head")
        self.visual_conv = conv(cfg.da_feature_channel, 1,
                                name="visual_conv")
        in_dim = cfg.inter_att_dims
        self.visual_mu_1 = nn.Dense(in_dim, name="visual_mu_1")
        self.visual_mu_2 = nn.Dense(cfg.z_dims, name="visual_mu_2")
        self.visual_var_1 = nn.Dense(in_dim, name="visual_var_1")
        self.visual_var_2 = nn.Dense(cfg.z_dims, name="visual_var_2")
        self.visual_branch = VisualBranch(cfg, name="visual_branch")
        if cfg.pred_bc:
            self.bc_conv = conv(cfg.da_feature_channel, 1, name="bc_conv")
            self.bc_mu_1 = nn.Dense(in_dim, name="bc_mu_1")
            self.bc_mu_2 = nn.Dense(cfg.z_dims, name="bc_mu_2")
            self.bc_var_1 = nn.Dense(in_dim, name="bc_var_1")
            self.bc_var_2 = nn.Dense(cfg.z_dims, name="bc_var_2")
            self.bc_branch = BCBranch(cfg.z_dims, name="bc_branch")

    def _heads(self, x, train):
        y = self.backbone(x, train=train)
        da = self.da_head(y, train=train)
        vis = flatten_nchw(self.visual_conv(da))
        v_mu = self.visual_mu_2(leaky_relu(self.visual_mu_1(vis)))
        v_logvar = self.visual_var_2(leaky_relu(self.visual_var_1(vis)))
        if self.params_cfg.pred_bc:
            bc = flatten_nchw(self.bc_conv(da))
            b_mu = self.bc_mu_2(leaky_relu(self.bc_mu_1(bc)))
            b_logvar = self.bc_var_2(leaky_relu(self.bc_var_1(bc)))
        else:
            b_mu = b_logvar = None
        return v_mu, v_logvar, b_mu, b_logvar

    def __call__(self, x, train: bool = False,
                 rng: Optional[jax.Array] = None):
        v_mu, v_logvar, b_mu, b_logvar = self._heads(x, train)
        if rng is not None:
            r1, r2 = jax.random.split(rng)
            z_v = v_mu + jnp.exp(0.5 * v_logvar) * jax.random.normal(
                r1, v_mu.shape, v_mu.dtype)
        else:
            z_v = v_mu
        out = self.visual_branch(z_v, train=train)
        out["mu"] = v_mu
        out["logvar"] = v_logvar
        if self.params_cfg.pred_bc:
            if rng is not None:
                z_b = b_mu + jnp.exp(0.5 * b_logvar) * jax.random.normal(
                    r2, b_mu.shape, b_mu.dtype)
            else:
                z_b = b_mu
            bc = self.bc_branch(z_b)
            out["steer"] = bc[:, 0]
            out["throttle"] = bc[:, 1]
            out["bc_mu"] = b_mu
            out["bc_logvar"] = b_logvar
        return out

    def latent(self, x, mode: str = "concate", train: bool = False):
        v_mu, _, b_mu, _ = self._heads(x, train)
        if b_mu is None:
            return v_mu
        if mode == "add":
            return v_mu + b_mu
        return jnp.concatenate([v_mu, b_mu], axis=-1)


class OldStem(nn.Module):
    """old_vae per-modality conv stem (old_vae.py:37-52):
    Conv(32,5,2,p5) -> 3x Conv(64,3,2,p3), LeakyReLU between; 144x256 -> 13x20."""

    @nn.compact
    def __call__(self, x):
        x = leaky_relu(conv(32, 5, 2, 5, name="conv0")(x))
        x = leaky_relu(conv(64, 3, 2, 3, name="conv1")(x))
        x = leaky_relu(conv(64, 3, 2, 3, name="conv2")(x))
        return conv(64, 3, 2, 3, name="conv3")(x)


class OldDeconv(nn.Module):
    """old_vae deconv stack (old_vae.py:98-140): fc 1024 -> [B,64,9,16] ->
    4x ConvTranspose(4, stride 2, pad 1) doubling to 144x256."""

    out_channels: int
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, z):
        h = leaky_relu(nn.Dense(1024, name="fc1")(z))
        # old_vae.py reverse_feature: Linear->LeakyReLU->Linear->LeakyReLU
        h = leaky_relu(nn.Dense(64 * 9 * 16, name="fc2")(h))
        h = unflatten_nchw(h, 64, 9, 16)
        for i, c in enumerate((64, 64, 32)):
            h = leaky_relu(ConvTransposeTorch(
                c, kernel_size=4, stride=2, padding=1, output_padding=0,
                name=f"deconv{i}")(h))
        h = ConvTransposeTorch(self.out_channels, kernel_size=4, stride=2,
                               padding=1, output_padding=0,
                               name="deconv3")(h)
        return jax.nn.sigmoid(h) if self.use_sigmoid else h


class OldVAE(nn.Module):
    """Early multi-modal VAE ablations (old_vae.py:33-361, oldv2_vae.py:33-401).

    Per-modality conv stems (rgb + optional extra channels treated as a
    second modality, e.g. lidar/route raster) -> flatten+concat ->
    fc 1024 -> mu/logvar(z_dims), reparameterized when `rng` is given ->
    lightweight 4-stage deconv recon heads. `v2=True` reproduces the
    oldv2_vae config-driven head set (seg recon + light-state classifier);
    v1 emits plain rgb reconstruction only. Plugs into the same perception
    trainer / losses contract as the rest of the zoo ("camera", "route",
    "light_state", "mu", "logvar" keys).
    """

    params_cfg: DANetParams
    v2: bool = False

    def setup(self):
        cfg = self.params_cfg
        self.rgb_stem = OldStem(name="rgb_stem")
        self.aux_channels = max(cfg.input_channel - 3, 0)
        if self.aux_channels:
            self.aux_stem = OldStem(name="aux_stem")
        self.fc_mu_1 = nn.Dense(1024, name="fc_mu_1")
        self.fc_mu_2 = nn.Dense(cfg.z_dims, name="fc_mu_2")
        self.fc_var_1 = nn.Dense(1024, name="fc_var_1")
        self.fc_var_2 = nn.Dense(cfg.z_dims, name="fc_var_2")
        out_ch = cfg.camera_output_channel if self.v2 else 3
        self.camera_head = OldDeconv(out_ch, use_sigmoid=not self.v2,
                                     name="camera_head")
        if self.v2 and cfg.pred_route:
            self.route_head = OldDeconv(1, use_sigmoid=True,
                                        name="route_head")
        if self.v2 and cfg.pred_light_state:
            self.light_fc_1 = nn.Dense(64, name="light_fc_1")
            self.light_fc_2 = nn.Dense(cfg.light_classes_num,
                                       name="light_fc_2")

    def encode(self, x, train: bool = False):
        del train  # no batch norm in the old stems
        h = flatten_nchw(self.rgb_stem(x[..., :3]))
        if self.aux_channels:
            h = jnp.concatenate(
                [h, flatten_nchw(self.aux_stem(x[..., 3:]))], axis=-1)
        mu = self.fc_mu_2(leaky_relu(self.fc_mu_1(h)))
        logvar = self.fc_var_2(leaky_relu(self.fc_var_1(h)))
        return mu, logvar

    def __call__(self, x, train: bool = False,
                 rng: Optional[jax.Array] = None):
        cfg = self.params_cfg
        mu, logvar = self.encode(x, train=train)
        if rng is not None:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mu.shape, mu.dtype)
        else:
            z = mu
        out = {"camera": self.camera_head(z), "mu": mu, "logvar": logvar}
        if self.v2 and cfg.pred_route:
            out["route"] = self.route_head(z)
        if self.v2 and cfg.pred_light_state:
            out["light_state"] = self.light_fc_2(
                leaky_relu(self.light_fc_1(z)))
        return out

    def latent(self, x, train: bool = False):
        mu, _ = self.encode(x, train=train)
        return mu


class OldV2VAE(OldVAE):
    """oldv2_vae.py: the config-driven multi-head variant."""

    v2: bool = True
