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


def _random_table(seed, s=24, h=144, w=256):
    rng = np.random.RandomState(seed)
    from cadre_tpu.ops.paint import disk_rows, rect_rows

    u0 = rng.uniform(-10, w, s)
    rows_r = rect_rows(u0, u0 + rng.uniform(0, 40, s),
                       rng.uniform(-10, h, s), rng.uniform(0, h + 10, s),
                       rng.uniform(0, 255, (s, 3)), rng.rand(s) > 0.3)
    rows_d = disk_rows(rng.uniform(0, w, s), rng.uniform(0, h, s),
                       rng.uniform(1, 300, s), rng.uniform(0, 255, (s, 3)),
                       rng.rand(s) > 0.3)
    # interleave kinds so ordering semantics are exercised
    return jnp.concatenate([rows_r, rows_d]).reshape(2, s, 8) \
        .swapaxes(0, 1).reshape(2 * s, 8)


@pytest.mark.parametrize("channels", [1, 3])
def test_paint_pallas_matches_xla(channels):
    from cadre_tpu.ops.paint import _paint_pallas, _paint_xla

    table = _random_table(1)
    base = jnp.full((144, 256, channels), 11.0, jnp.float32)
    ref = _paint_xla(base, table)
    out = _paint_pallas(base, table, interpret=True)
    assert bool(jnp.all(ref == out))
    assert int(jnp.sum(ref != 11.0)) > 0


def test_paint_vmaps_over_envs():
    from cadre_tpu.ops.paint import _paint_pallas, _paint_xla

    tables = jnp.stack([_random_table(i) for i in range(4)])
    base = jnp.zeros((4, 72, 128, 3), jnp.float32)
    ref = jax.vmap(_paint_xla)(base, tables)
    out = jax.vmap(lambda b, t: _paint_pallas(b, t, interpret=True))(
        base, tables)
    assert bool(jnp.all(ref == out))


def test_paint_order_last_writer_wins():
    from cadre_tpu.ops.paint import disk_rows, paint_shapes

    ones = np.ones(1)
    r1 = disk_rows(np.array([64.0]), np.array([36.0]), np.array([900.0]),
                   np.array([[10.0, 10.0, 10.0]]), ones > 0)
    r2 = disk_rows(np.array([64.0]), np.array([36.0]), np.array([100.0]),
                   np.array([[250.0, 250.0, 250.0]]), ones > 0)
    img = paint_shapes(jnp.zeros((72, 128, 3)),
                       jnp.concatenate([r1, r2]), use_pallas=False)
    assert float(img[36, 64, 0]) == 250.0       # inner painted last
    assert float(img[36, 64 + 15, 0]) == 10.0   # ring keeps first color
