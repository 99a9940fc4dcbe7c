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
    # TPU-framework extension (not in the reference output modes): an
    # auxiliary head z -> (dis, theta) supervising the PPO latent with the
    # privileged route geometry at PRETRAIN time.  Motivated by the round-2
    # latent probe (BENCH_r2_latent_probe.json): the stock CoPM objective
    # (seg+recon+light+BC) leaves route geometry linearly undecodable from
    # z (R^2 ~ 0) even though the route-fig input carries it at R^2 > 0.93,
    # which is why a frozen trained encoder could not beat a random one in
    # blind-route RL.  Off by default for reference parity.
    pred_route_geom: bool = False
    # Loss weight for the geom head.  The production losses follow the
    # reference's c*h*w scaling (cal_losses.py:9-285), so seg/route terms
    # sit in the thousands while a unit-weight 2-target MSE contributes
    # ~1e-5 of the encoder gradient — the head then only fits the target
    # mean (measured: geom MSE ~= target variance, probe R^2 ~ 0).  Set
    # high enough to compete with the reconstruction terms (~2e4 puts the
    # initial geom term at the same order as seg) when the latent must
    # actually retain route geometry.
    route_geom_weight: float = 1.0
    in_bc_speed: bool = True
    in_route: bool = True
    # TPU-framework extension (round-3 cascade experiment): BLANK the route
    # raster input plane (keep its channel so shapes/checkpoints are
    # unchanged) at every input-assembly point — pretrain, RL act, probe.
    # Route geometry must then be PERCEIVED from the camera's painted route
    # ribbon (perspective-projected, weather-degraded), which is a genuinely
    # nonlinear extraction a random frozen encoder cannot do: the round-2
    # ladder (BENCH_r2_cascade_geom.json) showed any full-rank projection of
    # the clean route-fig plane is already a sufficient statistic, so the
    # trained-vs-random comparison was insensitive to encoder quality.  The
    # route fig remains a pretrain TARGET (pred_route) — the encoder learns
    # camera -> route geometry.  Off by default for reference parity.
    in_route_blank: bool = False
    # remaining input-mode flags (auto_basic_config.change_input_mode)
    in_backbone: int = 1            # number of stacked camera frames
    in_lidar: bool = False
    in_left_camera: bool = False
    in_right_camera: bool = False
    in_speed: bool = False          # speed as an extra input channel
    input_mode: int = 9
    output_mode: int = 12
    # image geometry (config_files/agent_config.py:96: 256x144 fov90 camera)
    image_height: int = 144
    image_width: int = 256
    # encoder output geometry (stride-32 on 144x256)
    feat_h: int = 5
    feat_w: int = 8
    # fused PAM+CAM Pallas kernel for the dual-attention head:
    # True | False | "auto". "auto" currently resolves to the XLA path —
    # re-measured late round 2, XLA beats the kernel at every shipped
    # shape (see BENCH_NOTES.md); the kernel stays behind explicit True.
    use_fused_attention: object = "auto"

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


# ---------------------------------------------------------------------------
# Input/output mode tables — the reference's experiment-ablation grid
# (Config/auto_basic_config.py:81-140 change_input_mode and :142-213
# change_output_mode), expressed as DANetParams field updates.

INPUT_MODES = {
    1: dict(in_backbone=1, in_lidar=False, in_route=False),
    2: dict(in_backbone=4, in_lidar=False, in_route=False),
    3: dict(in_backbone=1, in_lidar=True, in_route=False),
    4: dict(in_backbone=4, in_lidar=True, in_route=False),
    5: dict(in_backbone=1, in_lidar=False, in_route=True),
    6: dict(in_backbone=1, in_lidar=False, in_route=True,
            in_left_camera=True, in_right_camera=True),
    7: dict(in_backbone=1, in_lidar=False, in_route=True, in_speed=True),
    8: dict(in_backbone=1, in_lidar=True, in_route=True, in_speed=True),
    9: dict(in_backbone=1, in_lidar=False, in_route=True, in_bc_speed=True),
    10: dict(in_backbone=1, in_lidar=False, in_route=False,
             in_bc_speed=True),
}

_IN_DEFAULTS = dict(in_left_camera=False, in_right_camera=False,
                    in_speed=False, in_bc_speed=False)

OUTPUT_MODES = {
    0: dict(),                                    # plain rgb reconstruction
    1: dict(pred_light_state=True, pred_light_dist=True),
    2: dict(pred_topdown_rgb=True, pred_light_state=True,
            pred_light_dist=True),
    3: dict(pred_light_state=True, pred_light_dist=True,
            pred_topdown_seg=True),
    4: dict(pred_lidar=True, pred_light_state=True, pred_light_dist=True),
    5: dict(pred_lidar=True, pred_topdown_rgb=True, pred_light_state=True,
            pred_light_dist=True),
    6: dict(pred_lidar=True, pred_topdown_seg=True, pred_light_state=True,
            pred_light_dist=True),
    7: dict(pred_camera_seg=True),
    8: dict(pred_camera_seg=True, pred_route=True),
    9: dict(pred_camera_seg=True, pred_route=True, pred_light_state=True),
    10: dict(pred_camera_seg=True, pred_left_camera_seg=True,
             pred_right_camera_seg=True, pred_route=True),
    11: dict(pred_camera_seg=True, pred_left_camera_seg=True,
             pred_right_camera_seg=True, pred_route=True,
             pred_light_state=True),
    12: dict(pred_camera_seg=True, pred_route=True, pred_light_state=True,
             pred_bc=True),
    13: dict(pred_camera_seg=True, pred_light_state=True),
    14: dict(pred_camera_seg=True, pred_light_state=True, pred_bc=True),
}

_OUT_DEFAULTS = dict(pred_light_state=False, pred_light_dist=False,
                     pred_camera_seg=False, pred_left_camera_seg=False,
                     pred_right_camera_seg=False, pred_route=False,
                     pred_bc=False, pred_lidar=False, pred_topdown_rgb=False,
                     pred_topdown_seg=False)


def params_for_modes(input_mode: int, output_mode: int,
                     **overrides) -> DANetParams:
    """Expand (input_mode, output_mode) into a DANetParams, reproducing the
    reference's channel arithmetic (auto_danet.py:111-145): input_channel =
    3*in_backbone per camera view (+3*in_backbone lidar, +in_backbone route,
    +1 speed); camera heads are 8-class seg when predicted, 3-channel recon
    otherwise."""
    fields = dict(_IN_DEFAULTS)
    fields.update(INPUT_MODES[input_mode])
    fields.update(_OUT_DEFAULTS)
    fields.update(OUTPUT_MODES[output_mode])

    nb = fields["in_backbone"]
    channels = nb * 3
    if fields.get("in_left_camera"):
        channels += nb * 3
    if fields.get("in_right_camera"):
        channels += nb * 3
    if fields.get("in_lidar"):
        channels += nb * 3
    if fields.get("in_route"):
        channels += nb * 1
    if fields.get("in_speed"):
        channels += 1
    fields["input_channel"] = channels
    fields["camera_output_channel"] = 8 if fields["pred_camera_seg"] else 3
    fields["left_camera_output_channel"] = \
        8 if fields["pred_left_camera_seg"] else 3
    fields["right_camera_output_channel"] = \
        8 if fields["pred_right_camera_seg"] else 3
    fields["input_mode"] = input_mode
    fields["output_mode"] = output_mode
    fields.update(overrides)
    return dataclasses.replace(DANetParams(), **fields)
