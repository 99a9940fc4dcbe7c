"""U-Net family perception ablations.

Reference family (carla_perception/Networks/): U_Net (unet.py:61), AttU_Net
(att_unet.py:97 — additive attention gates on skips), R2U_Net / R2AttU_Net
(rcnn_unet.py / rcnn_attunet.py — recurrent residual conv blocks), and
NestedUNet (nested_unet.py — UNet++ dense skips). All are image-to-image
models used as encoder ablations; implemented here as idiomatic NHWC flax
with a shared conv-block vocabulary.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from cadre_tpu.models.torch_compat import batch_norm, conv, max_pool_torch


class DoubleConv(nn.Module):
    features: int
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = conv(self.features, 3, 1, 1, use_bias=True,
                     name=f"conv{i}")(x)
            x = batch_norm(train, f"bn{i}", self.axis_name)(x)
            x = nn.relu(x)
        return x


class RecurrentConv(nn.Module):
    """R2U recurrent conv: y_{t+1} = relu(bn(conv(x + y_t))) (rcnn_unet)."""

    features: int
    t: int = 2
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = conv(self.features, 3, 1, 1, name="conv")
        bn = batch_norm(train, "bn", self.axis_name)
        y = nn.relu(bn(c(x)))
        for _ in range(self.t):
            y = nn.relu(bn(c(x + y)))
        return y


class RRCNNBlock(nn.Module):
    """Residual pair of recurrent convs."""

    features: int
    t: int = 2
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = conv(self.features, 1, name="proj")(x)
        y = RecurrentConv(self.features, self.t, self.axis_name,
                          name="rc1")(x1, train=train)
        y = RecurrentConv(self.features, self.t, self.axis_name,
                          name="rc2")(y, train=train)
        return x1 + y


class AttentionGate(nn.Module):
    """Additive attention on skip connections (att_unet.py)."""

    inter: int

    @nn.compact
    def __call__(self, g, x):
        wg = conv(self.inter, 1, name="wg")(g)
        wx = conv(self.inter, 1, name="wx")(x)
        psi = nn.sigmoid(conv(1, 1, name="psi")(nn.relu(wg + wx)))
        return x * psi


def _upsample(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


class UNet(nn.Module):
    """Plain U-Net; `block` selects plain/recurrent bodies, `attention`
    enables gated skips (covers U_Net / AttU_Net / R2U_Net / R2AttU_Net)."""

    out_channels: int = 3
    base: int = 64
    depth: int = 4
    recurrent: bool = False
    attention: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def body(feats, name):
            if self.recurrent:
                return RRCNNBlock(feats, axis_name=self.axis_name,
                                  name=name)
            return DoubleConv(feats, axis_name=self.axis_name, name=name)

        skips = []
        for d in range(self.depth):
            x = body(self.base * 2 ** d, f"down{d}")(x, train=train)
            skips.append(x)
            x = max_pool_torch(x, 2, 2, 0)
        x = body(self.base * 2 ** self.depth, "bottleneck")(x, train=train)

        for d in reversed(range(self.depth)):
            x = _upsample(x)
            x = conv(self.base * 2 ** d, 3, 1, 1, name=f"upconv{d}")(x)
            skip = skips[d]
            if self.attention:
                skip = AttentionGate(self.base * 2 ** max(d - 1, 0),
                                     name=f"att{d}")(x, skip)
            x = jnp.concatenate([skip, x], axis=-1)
            x = body(self.base * 2 ** d, f"up{d}")(x, train=train)
        return conv(self.out_channels, 1, name="out")(x)


class NestedUNet(nn.Module):
    """UNet++ dense-skip variant (nested_unet.py)."""

    out_channels: int = 3
    base: int = 32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = [self.base * 2 ** i for i in range(5)]

        def blk(feats, name, *inputs):
            h = jnp.concatenate(inputs, axis=-1) if len(inputs) > 1 \
                else inputs[0]
            return DoubleConv(feats, axis_name=self.axis_name,
                              name=name)(h, train=train)

        x00 = blk(f[0], "x00", x)
        x10 = blk(f[1], "x10", max_pool_torch(x00, 2, 2, 0))
        x01 = blk(f[0], "x01", x00, _upsample(x10))
        x20 = blk(f[2], "x20", max_pool_torch(x10, 2, 2, 0))
        x11 = blk(f[1], "x11", x10, _upsample(x20))
        x02 = blk(f[0], "x02", x00, x01, _upsample(x11))
        x30 = blk(f[3], "x30", max_pool_torch(x20, 2, 2, 0))
        x21 = blk(f[2], "x21", x20, _upsample(x30))
        x12 = blk(f[1], "x12", x10, x11, _upsample(x21))
        x03 = blk(f[0], "x03", x00, x01, x02, _upsample(x12))
        return conv(self.out_channels, 1, name="out")(x03)
