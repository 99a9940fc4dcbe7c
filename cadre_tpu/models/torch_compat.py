"""PyTorch-semantics helpers for checkpoint parity.

The reference framework's perception checkpoints were trained with PyTorch;
to load them and reproduce logits we must match torch's conv-transpose
output-padding convention and BatchNorm hyperparameters exactly
(reference: carla_perception/Networks/danet_blocks/visual_branch.py:141-163).

Everything here is NHWC (TPU-native); the torch->flax checkpoint importer in
`cadre_tpu.utils.torch_import` handles the layout permutations.
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch defaults we must match
BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (0.1)
LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default


def leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def conv_transpose_torch(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None,
    *,
    stride: int = 2,
    padding: int = 1,
    output_padding: Union[int, Tuple[int, int]] = 1,
) -> jax.Array:
    """2D transposed convolution with torch `ConvTranspose2d` semantics.

    x:      [B, H, W, Cin]   (NHWC)
    kernel: [kh, kw, Cin, Cout]  (HWIO, *not* flipped — we flip internally)
    output size per dim: (H-1)*stride - 2*padding + kh + output_padding

    Implemented as an input-dilated convolution with a spatially-flipped
    kernel, which is the exact adjoint torch computes. output_padding adds
    extra rows/cols on the bottom/right only (torch convention).
    """
    if isinstance(output_padding, int):
        output_padding = (output_padding, output_padding)
    kh, kw = kernel.shape[0], kernel.shape[1]
    # flip spatially: transposed conv correlates with the rotated kernel
    flipped = kernel[::-1, ::-1, :, :]
    pad_h = (kh - 1 - padding, kh - 1 - padding + output_padding[0])
    pad_w = (kw - 1 - padding, kw - 1 - padding + output_padding[1])
    out = jax.lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(stride, stride),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias
    return out


class ConvTransposeTorch(nn.Module):
    """flax module wrapping `conv_transpose_torch` with its own params."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.kernel_size, self.kernel_size, cin, self.features),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return conv_transpose_torch(
            x,
            k,
            b,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


def batch_norm(train: bool, name: str, axis_name: str | None = None) -> nn.BatchNorm:
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1).

    `axis_name` enables cross-replica batch stats (the TPU-native equivalent of
    the reference's SyncBatchNorm, Models/experiments_builder.py:81).
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        axis_name=axis_name,
        name=name,
    )


def conv(features: int, kernel: int, stride: int = 1, padding: int = 0,
         use_bias: bool = True, name: str | None = None) -> nn.Conv:
    """nn.Conv with explicit torch-style symmetric integer padding."""
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        use_bias=use_bias,
        name=name,
    )


def max_pool_torch(x, kernel: int = 3, stride: int = 2, padding: int = 1):
    """Max pool matching torch MaxPool2d (pads with -inf)."""
    return nn.max_pool(
        x,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


def flatten_nchw(x: jax.Array) -> jax.Array:
    """Flatten an NHWC tensor in NCHW (torch) element order.

    Torch modules flatten [B,C,H,W] to [B, C*H*W]; matching the order keeps
    downstream Linear layers checkpoint-compatible without weight permutation
    surprises (the importer still permutes, but tests compare orderings).
    """
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)


def unflatten_nchw(x: jax.Array, c: int, h: int, w: int) -> jax.Array:
    """Inverse of flatten_nchw: [B, C*H*W] -> NHWC."""
    return jnp.transpose(x.reshape(x.shape[0], c, h, w), (0, 2, 3, 1))
