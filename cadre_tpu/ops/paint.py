"""Fused shape-table renderer — the device env's rasterizer as ONE pass.

The device-resident env paints its observations (route figure + synthetic
camera, jax_env.py `_render_fig`/`_render_rgb`, twins of
env_wrapper.py:240-344 `_draw_route` and the sim camera) as a SEQUENCE of
lax.scan passes: each painted primitive re-reads and re-writes the whole
[H, W, C] canvas through HBM, ~100 round trips per frame — the measured
~20% render tax on device-env throughput.

This module replaces the sequence with a single shape TABLE [S, 8] f32 of
rows `(kind, a, b, c, d, r, g, b)` painted in order (last writer wins):

  kind 0 (rect): hit = (a <= x < b) & (c <= y < d)
  kind 1 (disk): hit = (x - a)^2 + (y - b)^2 <= c

and two interchangeable executors with identical per-pixel semantics:

  - `_paint_xla`: one lax.scan over rows (reference semantics; default off
    TPU, used by the CPU test mesh and as the parity oracle)
  - `_paint_pallas`: a Pallas kernel holding the canvas in VMEM for the
    whole table — one HBM read + one write per frame regardless of S.

Invalid/masked primitives are encoded as never-hit geometry (empty rect /
negative squared radius), so there is no separate validity plane.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RECT = 0.0
DISK = 1.0


def rect_rows(u0, u1, v0, v1, colors, valid) -> jnp.ndarray:
    """[S, 8] rect rows; invalid rows become empty rects (u0 == u1)."""
    u0 = jnp.asarray(u0, jnp.float32)
    colors = jnp.broadcast_to(jnp.asarray(colors, jnp.float32),
                              u0.shape + (3,))
    u1 = jnp.where(valid, jnp.asarray(u1, jnp.float32), u0)
    return jnp.stack([jnp.zeros_like(u0), u0, u1,
                      jnp.asarray(v0, jnp.float32) * 1.0,
                      jnp.asarray(v1, jnp.float32) * 1.0,
                      colors[..., 0], colors[..., 1], colors[..., 2]],
                     axis=-1)


def disk_rows(cx, cy, r2, colors, valid) -> jnp.ndarray:
    """[S, 8] disk rows; invalid rows get negative squared radius."""
    cx = jnp.asarray(cx, jnp.float32)
    colors = jnp.broadcast_to(jnp.asarray(colors, jnp.float32),
                              cx.shape + (3,))
    r2 = jnp.where(valid, jnp.asarray(r2, jnp.float32), -1.0)
    return jnp.stack([jnp.ones_like(cx), cx,
                      jnp.asarray(cy, jnp.float32) * 1.0, r2,
                      jnp.zeros_like(cx),
                      colors[..., 0], colors[..., 1], colors[..., 2]],
                     axis=-1)


def _hit(row, xx, yy):
    rect = (xx >= row[1]) & (xx < row[2]) & (yy >= row[3]) & (yy < row[4])
    disk = (xx - row[1]) ** 2 + (yy - row[2]) ** 2 <= row[3]
    return jnp.where(row[0] < 0.5, rect, disk)


def _paint_xla(base: jnp.ndarray, shapes: jnp.ndarray) -> jnp.ndarray:
    """Sequential scan executor; base [H, W, C], shapes [S, 8]."""
    h, w = base.shape[:2]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]

    def body(img, row):
        m = _hit(row, xx, yy)
        col = row[5:5 + img.shape[-1]]
        return jnp.where(m[..., None], col[None, None], img), None

    img, _ = jax.lax.scan(body, base, shapes)
    return img


def _paint_kernel(shapes_ref, base_ref, out_ref):
    c, h, w = out_ref.shape
    # mosaic iota is integer-only; cast to the f32 coordinate grid
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    img = base_ref[...]

    def body(s, img):
        kind = shapes_ref[s, 0]
        a, b = shapes_ref[s, 1], shapes_ref[s, 2]
        p, q = shapes_ref[s, 3], shapes_ref[s, 4]
        rect = (xx >= a) & (xx < b) & (yy >= p) & (yy < q)
        disk = (xx - a) ** 2 + (yy - b) ** 2 <= p
        # and/or combine instead of select: mosaic cannot select between
        # i1 vectors
        is_rect = kind < 0.5
        m = (rect & is_rect) | (disk & ~is_rect)
        return jnp.stack(
            [jnp.where(m, shapes_ref[s, 5 + j], img[j]) for j in range(c)])

    out_ref[...] = jax.lax.fori_loop(0, shapes_ref.shape[0], body, img,
                                     unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paint_pallas(base: jnp.ndarray, shapes: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """VMEM-resident executor; base [H, W, C] like the XLA path."""
    h, w, c = base.shape
    chw = jnp.transpose(base, (2, 0, 1))
    out = pl.pallas_call(
        _paint_kernel,
        out_shape=jax.ShapeDtypeStruct((c, h, w), base.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec()],
        out_specs=pl.BlockSpec(),
        interpret=interpret,
    )(shapes, chw)
    return jnp.transpose(out, (1, 2, 0))


def paint_shapes(base: jnp.ndarray, shapes: jnp.ndarray,
                 use_pallas: bool | None = None) -> jnp.ndarray:
    """Paint `shapes` [S, 8] onto `base` [H, W, C] in row order.

    Executor defaults to the Pallas kernel on TPU backends and the scan
    fallback elsewhere; both produce bit-identical images.
    """
    if use_pallas is None:
        forced = os.environ.get("CADRE_PAINT", "")
        if forced:
            use_pallas = forced == "pallas"
        else:
            use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _paint_pallas(base, shapes)
    return _paint_xla(base, shapes)
