"""Numerical parity of torch-semantics helpers vs real torch ops.

These tests construct small *generic* torch layers (Conv2d/ConvTranspose2d/
BatchNorm2d/MaxPool2d) with the hyperparameters the reference architecture
uses, and check our NHWC JAX equivalents reproduce them — the foundation for
loading reference .pt checkpoints bit-faithfully.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cadre_tpu.models.torch_compat import (  # noqa: E402
    conv_transpose_torch,
    max_pool_torch,
)


def _to_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _kernel_oihw_to_hwio(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


@pytest.mark.parametrize("output_padding", [(0, 1), (1, 1)])
def test_conv_transpose_matches_torch(output_padding):
    torch.manual_seed(0)
    m = torch.nn.ConvTranspose2d(6, 4, kernel_size=3, stride=2, padding=1,
                                 output_padding=output_padding)
    x = torch.randn(2, 6, 5, 8)
    with torch.no_grad():
        ref = m(x)
    # torch ConvTranspose2d weight layout: [Cin, Cout, kh, kw] -> HWIO
    k = jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 0, 1))
    b = jnp.asarray(m.bias.detach().numpy())
    out = conv_transpose_torch(_to_nhwc(x), k, b, stride=2, padding=1,
                               output_padding=output_padding)
    assert out.shape == tuple(np.array(ref.shape)[[0, 2, 3, 1]])
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_decoder_pyramid_shapes():
    """h: 5->9->18->36->72->144, w: 8->16->32->64->128->256 (visual_branch.py)."""
    x = jnp.zeros((1, 5, 8, 16))
    k1 = jnp.zeros((3, 3, 16, 8))
    y = conv_transpose_torch(x, k1, None, output_padding=(0, 1))
    assert y.shape == (1, 9, 16, 8)
    k2 = jnp.zeros((3, 3, 8, 8))
    y = conv_transpose_torch(y, k2, None, output_padding=1)
    assert y.shape == (1, 18, 32, 8)
    for expect in [(36, 64), (72, 128), (144, 256)]:
        y = conv_transpose_torch(y, k2, None, output_padding=1)
        assert y.shape[1:3] == expect


def test_strided_conv_matches_torch():
    torch.manual_seed(1)
    m = torch.nn.Conv2d(4, 8, kernel_size=7, stride=2, padding=3, bias=True)
    x = torch.randn(2, 4, 144, 256)
    with torch.no_grad():
        ref = m(x)
    out = jax.lax.conv_general_dilated(
        _to_nhwc(x), _kernel_oihw_to_hwio(m.weight),
        window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(m.bias.detach().numpy())
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1), atol=1e-3)


def test_max_pool_matches_torch():
    torch.manual_seed(2)
    x = torch.randn(2, 3, 72, 128)
    ref = torch.nn.functional.max_pool2d(x, 3, stride=2, padding=1)
    out = max_pool_torch(_to_nhwc(x))
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1), atol=1e-6)
