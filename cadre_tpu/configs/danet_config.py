"""Perception-network configuration mirroring the reference's production setup.

Contract from carla_perception/Config/auto_danet.py:25-160 and
auto_basic_config.py:81-213: input mode 9 (1 center camera + route raster +
speed-for-BC => 4 input channels), output mode 12 (camera seg 8 classes +
route recon + traffic-light state + behavior cloning), z_dims 256,
att_type 'transformer', da_feature_channel 512, inter_att_dims 512.
"""
from __future__ import annotations

import dataclasses

@dataclasses.dataclass(frozen=True)
class DANetParams:
    net_name: str = "autoencoder"
    model_name: str = "danet"
    backbone: str = "resnet18"
    input_channel: int = 4          # rgb (3) + route raster (1), input mode 9
    da_feature_channel: int = 512
    inter_att_dims: int = 512
    z_dims: int = 256
    att_type: str = "transformer"   # 'transformer' | 'position' | 'invaild'
    light_classes_num: int = 4
    camera_output_channel: int = 8  # 8 seg classes (CARLA 0.9.10 reduced set)
    left_camera_output_channel: int = 3
    right_camera_output_channel: int = 3
    # output mode 12 flags
    pred_camera_seg: bool = True
    pred_left_camera_seg: bool = False
    pred_right_camera_seg: bool = False
    pred_route: bool = True
    pred_light_state: bool = True
    pred_light_dist: bool = False
    pred_lidar: bool = False
    pred_topdown_rgb: bool = False
    pred_topdown_seg: bool = False
    pred_bc: bool = True
    in_bc_speed: bool = True
    in_route: bool = True
    # image geometry (config_files/agent_config.py:96: 256x144 fov90 camera)
    image_height: int = 144
    image_width: int = 256
    # encoder output geometry (stride-32 on 144x256)
    feat_h: int = 5
    feat_w: int = 8
    # fused PAM+CAM Pallas kernel for the dual-attention head (TPU only)
    use_fused_attention: bool = False

    @property
    def latent_dim(self) -> int:
        """PPO latent width: concat of visual+bc z (ppo_agent/models.py:38-41)."""
        return 2 * self.z_dims if self.pred_bc else self.z_dims


@dataclasses.dataclass(frozen=True)
class PerceptionTrainParams:
    """Training contract from Config/auto_danet.py:173-179, auto_basic_config.py."""

    batch_size: int = 48
    lr: float = 1e-4
    betas: tuple = (0.9, 0.999)
    weight_decay: float = 5e-4
    max_epochs: int = 100
    warmup_epochs: int = 1
    # loss weights (Models/auto_trainer.py:267-298)
    w_seg: float = 1.0
    w_route: float = 0.5
    w_light_state: float = 0.1
    w_bc: float = 1.0


def danet_params(**overrides) -> DANetParams:
    return dataclasses.replace(DANetParams(), **overrides)
