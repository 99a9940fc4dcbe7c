"""Pallas kernel correctness in interpreter mode (CPU CI; the compiled path
is exercised on real TPU by bench.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cadre_tpu.ops.dual_attention import cam_apply, pam_apply
from cadre_tpu.ops.pallas_dual_attention import dual_attention_pallas


@pytest.mark.parametrize("batch", [3, 8])
def test_fused_dual_attention_matches_xla(batch):
    B, H, W, C = batch, 5, 8, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (B, H, W, C))
    q = jax.random.normal(ks[1], (B, H, W, C // 8))
    k = jax.random.normal(ks[2], (B, H, W, C // 8))
    v = jax.random.normal(ks[3], (B, H, W, C))
    xc = jax.random.normal(ks[4], (B, H, W, C))
    gp = jnp.ones((1,)) * 0.5
    gc = jnp.ones((1,)) * 0.3

    op, oc = dual_attention_pallas(x, q, k, v, gp, xc, gc, interpret=True)
    rp = pam_apply(x, q, k, v, gp)
    rc = cam_apply(xc, gc)
    np.testing.assert_allclose(np.asarray(op), np.asarray(rp), atol=2e-4)
    np.testing.assert_allclose(np.asarray(oc), np.asarray(rc), atol=2e-3)
