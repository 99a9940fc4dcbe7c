"""Model-name -> module registry (the reference's `get_model` role).

The reference builds networks from config `model_name` strings
(carla_perception/Models/experiments_builder.py network construction +
Networks/*/get_model factories). Here `build_model(name, cfg)` returns a
flax module satisfying the perception-trainer heads contract
((x, train) -> dict with "camera"/"route"/"light_state"/"mu"/... keys), or
None for "danet" (the trainer's default path, which also wires bc_speed).
"""
from __future__ import annotations

from typing import Dict, Optional

from flax import linen as nn

from cadre_tpu.configs.danet_config import DANetParams


class SingleHeadAdapter(nn.Module):
    """Wraps a plain image->image module (the UNet family) into the heads
    contract; the reference trains these with a single recon/seg loss
    (Models/cal_losses.py unet branch)."""

    inner: nn.Module
    key: str = "camera"

    @nn.compact
    def __call__(self, x, train: bool = False, rng=None):
        return {self.key: self.inner(x, train=train)}


def adapt_config(name: str, cfg: DANetParams) -> DANetParams:
    """Align the output-head flags with what the named model emits, so the
    multi-task loss (perception/losses.total_danet_loss) only scores heads
    that exist — the reference does this via per-model config classes
    (Config/*.py output modes)."""
    import dataclasses

    name = name.lower()
    if name in ("unet", "att_unet", "r2_unet", "r2att_unet", "nested_unet"):
        return dataclasses.replace(cfg, pred_route=False,
                                   pred_light_state=False,
                                   pred_light_dist=False, pred_bc=False)
    if name == "old_vae":
        return dataclasses.replace(cfg, pred_camera_seg=False,
                                   pred_route=False, pred_light_state=False,
                                   pred_light_dist=False, pred_bc=False)
    if name == "oldv2_vae":
        return dataclasses.replace(cfg, pred_light_dist=False,
                                   pred_bc=False)
    return cfg


def build_model(name: str, cfg: DANetParams,
                axis_name: Optional[str] = None) -> Optional[nn.Module]:
    """Registry names mirror the reference Networks/ zoo:
    danet | vanilla_vae | beta_vae | da_beta_vae | old_vae | oldv2_vae |
    unet | att_unet | r2_unet | r2att_unet | nested_unet.
    """
    from cadre_tpu.models.unet import NestedUNet, UNet
    from cadre_tpu.models.vae import (
        BetaVAE,
        DABetaVAE,
        OldV2VAE,
        OldVAE,
        VanillaVAE,
    )

    name = name.lower()
    if name == "danet":
        return None
    vae_family: Dict[str, type] = {
        "vanilla_vae": VanillaVAE,
        "beta_vae": BetaVAE,
        "da_beta_vae": DABetaVAE,
        "old_vae": OldVAE,
        "oldv2_vae": OldV2VAE,
    }
    if name in vae_family:
        kwargs = {"params_cfg": cfg}
        if name == "da_beta_vae":  # only the DANet-trunk VAE syncs BN stats
            kwargs["axis_name"] = axis_name
        return vae_family[name](**kwargs)
    out_ch = cfg.camera_output_channel
    unet_family = {
        "unet": dict(recurrent=False, attention=False),
        "att_unet": dict(recurrent=False, attention=True),
        "r2_unet": dict(recurrent=True, attention=False),
        "r2att_unet": dict(recurrent=True, attention=True),
    }
    if name in unet_family:
        return SingleHeadAdapter(
            UNet(out_channels=out_ch, axis_name=axis_name,
                 **unet_family[name]))
    if name == "nested_unet":
        return SingleHeadAdapter(
            NestedUNet(out_channels=out_ch, axis_name=axis_name))
    raise ValueError(f"unknown model name {name!r}")
