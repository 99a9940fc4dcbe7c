"""ResNet backbone (stride-32, no avgpool/fc) for the DANet perception encoder.

Behavioral contract from the reference backbone
(carla_perception/Networks/danet_blocks/resnet.py:26-183): custom input channel
count, conv7x7/s2 stem with bias, maxpool3/s2, four BasicBlock/Bottleneck
stages; 144x256 input -> 5x8 spatial output at 512 channels (resnet18).

TPU-first: NHWC layout, BatchNorm with optional cross-replica axis, bf16-ready
(params stay f32; activations follow input dtype).
"""
from __future__ import annotations

from flax import linen as nn

from cadre_tpu.models.torch_compat import batch_norm, conv, max_pool_torch


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = conv(self.planes, 3, self.stride, 1, use_bias=False, name="conv1")(x)
        out = batch_norm(train, "bn1", self.axis_name)(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, 1, 1, use_bias=False, name="conv2")(out)
        out = batch_norm(train, "bn2", self.axis_name)(out)
        if self.use_downsample:
            identity = conv(self.planes, 1, self.stride, 0, use_bias=False,
                            name="downsample_conv")(x)
            identity = batch_norm(train, "downsample_bn", self.axis_name)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False
    axis_name: str | None = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = conv(self.planes, 1, 1, 0, use_bias=False, name="conv1")(x)
        out = batch_norm(train, "bn1", self.axis_name)(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, self.stride, 1, use_bias=False, name="conv2")(out)
        out = batch_norm(train, "bn2", self.axis_name)(out)
        out = nn.relu(out)
        out = conv(self.planes * self.expansion, 1, 1, 0, use_bias=False,
                   name="conv3")(out)
        out = batch_norm(train, "bn3", self.axis_name)(out)
        if self.use_downsample:
            identity = conv(self.planes * self.expansion, 1, self.stride, 0,
                            use_bias=False, name="downsample_conv")(x)
            identity = batch_norm(train, "downsample_bn", self.axis_name)(identity)
        return nn.relu(out + identity)


_STAGE_PLANES = (64, 128, 256, 512)

RESNET_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 4),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 4),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 4),
}


class ResNetBackbone(nn.Module):
    """Headless ResNet: [B,H,W,Cin] -> [B,H/32,W/32,512*expansion]."""

    arch: str = "resnet18"
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, layers, expansion = RESNET_SPECS[self.arch]
        x = conv(64, 7, 2, 3, use_bias=True, name="conv1")(x)
        x = batch_norm(train, "bn1", self.axis_name)(x)
        x = nn.relu(x)
        x = max_pool_torch(x)

        inplanes = 64
        for stage, (planes, blocks) in enumerate(zip(_STAGE_PLANES, layers)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                needs_ds = b == 0 and (s != 1 or inplanes != planes * expansion)
                x = block_cls(
                    planes=planes,
                    stride=s,
                    use_downsample=needs_ds,
                    axis_name=self.axis_name,
                    name=f"layer{stage + 1}_{b}",
                )(x, train=train)
                inplanes = planes * expansion
        return x
