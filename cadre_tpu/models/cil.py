"""Conditional imitation learning baselines.

Reference family (carla_perception/Networks/):
  - CarlaNet (cil_net.py:6+): 8-conv + fc image trunk, speed fc, joint fc,
    command-branched control heads (the original CIL architecture).
  - CilrsNet (cilrs_net.py:13-160): resnet perception + measurement fc +
    join fc, N command branches each predicting controls, plus a speed
    prediction head.
The command-branch bank uses the same dense-evaluate + one-hot-select
pattern as the RL policy bank — TPU-friendly, no python branching.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cadre_tpu.models.resnet import ResNetBackbone
from cadre_tpu.models.torch_compat import batch_norm, conv


class _FC(nn.Module):
    neurons: Tuple[int, ...]
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, n in enumerate(self.neurons):
            x = nn.Dense(n, name=f"fc{i}")(x)
            if i < len(self.neurons) - 1:
                x = nn.relu(x)
                if train and self.dropout > 0:
                    x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x


class Branches(nn.Module):
    """N command branches evaluated densely, selected by one-hot."""

    num_branches: int
    neurons: Tuple[int, ...]

    @nn.compact
    def __call__(self, j, command=None, train: bool = False):
        outs = [
            _FC(self.neurons, name=f"branch{i}")(j, train=train)
            for i in range(self.num_branches)
        ]
        stacked = jnp.stack(outs, axis=1)  # [B, N, out]
        if command is None:
            return stacked
        onehot = jax.nn.one_hot(command, self.num_branches,
                                dtype=stacked.dtype)
        return jnp.einsum("bno,bn->bo", stacked, onehot)


class CarlaNet(nn.Module):
    """8-conv CIL trunk + speed fusion + command branches (cil_net.py)."""

    num_branches: int = 4
    out_dim: int = 3  # steer, throttle, brake

    with_embeddings: bool = False

    @nn.compact
    def __call__(self, image, speed, command=None, train: bool = False):
        chans = [32, 32, 64, 64, 128, 128, 256, 256]
        strides = [2, 1, 2, 1, 2, 1, 1, 1]
        x = image
        for i, (c, s) in enumerate(zip(chans, strides)):
            k = 5 if i == 0 else 3
            x = conv(c, k, s, k // 2, name=f"conv{i}")(x)
            x = batch_norm(train, f"bn{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = _FC((512, 512), dropout=0.3, name="img_fc")(x, train=train)
        s = _FC((128, 128), name="speed_fc")(speed, train=train)
        j = _FC((512,), name="join_fc")(
            jnp.concatenate([x, s], axis=-1), train=train)
        controls = Branches(self.num_branches, (256, 256, self.out_dim),
                            name="branches")(j, command, train=train)
        pred_speed = _FC((256, 256, 1), name="speed_branch")(x, train=train)
        if self.with_embeddings:
            return controls, pred_speed[..., 0], x, j
        return controls, pred_speed[..., 0]


class CilrsNet(nn.Module):
    """ResNet perception + measurement fusion + command branches + speed
    head (cilrs_net.py:13-160)."""

    arch: str = "resnet34"
    num_branches: int = 4
    out_dim: int = 3

    @nn.compact
    def __call__(self, image, speed, command=None, train: bool = False):
        feat = ResNetBackbone(arch=self.arch, name="perception")(
            image, train=train)
        feat = jnp.mean(feat, axis=(1, 2))  # global average pool
        x = _FC((512,), name="perception_fc")(feat, train=train)
        m = _FC((128, 128), name="measurements_fc")(speed, train=train)
        j = _FC((512,), name="join_fc")(
            jnp.concatenate([x, m], axis=-1), train=train)
        controls = Branches(self.num_branches, (256, 256, self.out_dim),
                            name="branches")(j, command, train=train)
        pred_speed = _FC((256, 256, 1), name="speed_branch")(x, train=train)
        return controls, pred_speed[..., 0]


class UncertainNet(nn.Module):
    """Aleatoric-uncertainty heads over CarlaNet embeddings
    (cil_net.py:115-163): per-command log-variance control branches
    (structure 2) or one shared head tiled over commands (structure 3),
    plus a speed log-variance head on the image embedding."""

    structure: int = 2
    num_branches: int = 4
    out_dim: int = 3

    @nn.compact
    def __call__(self, img_emb, emb, command=None, train: bool = False):
        if self.structure not in (2, 3):
            raise ValueError("structure must be 2 or 3")
        if self.structure == 2:
            log_var_control = Branches(
                self.num_branches, (256, 256, self.out_dim),
                name="uncert_control_branches")(emb, command, train=train)
        else:
            shared = _FC((256, 256, self.out_dim),
                         name="uncert_control_shared")(emb, train=train)
            if command is None:
                log_var_control = jnp.tile(shared[:, None, :],
                                           (1, self.num_branches, 1))
            else:
                log_var_control = shared
        log_var_speed = _FC((256, 256, 1), name="uncert_speed_branch")(
            img_emb, train=train)
        return log_var_control, log_var_speed[..., 0]


class CilFinalNet(nn.Module):
    """CarlaNet + UncertainNet composition (cil_net.py:164-191): control and
    speed predictions with matching log-variance estimates."""

    structure: int = 2
    num_branches: int = 4
    out_dim: int = 3

    @nn.compact
    def __call__(self, image, speed, command=None, train: bool = False):
        controls, pred_speed, img_emb, emb = CarlaNet(
            num_branches=self.num_branches, out_dim=self.out_dim,
            with_embeddings=True, name="carla_net")(
                image, speed, command, train=train)
        log_var_control, log_var_speed = UncertainNet(
            structure=self.structure, num_branches=self.num_branches,
            out_dim=self.out_dim, name="uncertain_net")(
                img_emb, emb, command, train=train)
        return controls, pred_speed, log_var_control, log_var_speed


class SmallCNN(nn.Module):
    """3-conv + 2-fc encoder (ppo_agent/models.py:261-290) — the DANet-free
    RL observation encoder ablation."""

    z_dims: int = 256

    @nn.compact
    def __call__(self, x):
        for i, c in enumerate([64, 32, 32]):
            x = nn.Conv(c, (4, 4), strides=(2, 2), padding="VALID",
                        name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(512, name="fc1")(x))
        return nn.relu(nn.Dense(self.z_dims, name="fc2")(x))
