"""Fused PAM+CAM Pallas kernel — one VMEM pass for both attention branches.

XLA compiles the position- and channel-attention chains as separate fusions
with separate HBM round-trips for the 5x8x128 activations; this kernel
computes BOTH branches (energy -> softmax -> apply -> gamma residual) for
one batch row in a single VMEM residency. Math contract is identical to
`cadre_tpu.ops.dual_attention.{pam_apply,cam_apply}` (da_att.py:19-83):

  PAM: att = softmax_k(q @ k^T);  out = att @ v;        y = g*out + x
  CAM: E = x^T x (channel gram); att = softmax_j(rowmax(E)-E);
       out = x @ att^T;                                  y = g*out + x

Shapes per batch row: x/v [P=HW, C], q/k [P, Cqk=C/8]. P=40, C=128 for the
production encoder — both fit VMEM trivially; the grid is over batch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(xp_ref, q_ref, k_ref, v_ref, gp_ref, xc_ref, gc_ref,
                  outp_ref, outc_ref):
    g_pam = gp_ref[0]
    g_cam = gc_ref[0]
    nb = xp_ref.shape[0]  # batch rows per grid step (static)
    for i in range(nb):
        xp = xp_ref[i]          # [P, C]
        q = q_ref[i]            # [P, Cqk]
        k = k_ref[i]
        v = v_ref[i]
        xc = xc_ref[i]

        # ---- position attention ----
        energy = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [P, P]
        att = jax.nn.softmax(energy, axis=-1)
        out_p = jnp.dot(att.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)  # [P, C]
        outp_ref[i] = (g_pam * out_p
                       + xp.astype(jnp.float32)).astype(outp_ref.dtype)

        # ---- channel attention ----
        gram = jax.lax.dot_general(
            xc, xc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [C, C]
        gram_new = jnp.max(gram, axis=-1, keepdims=True) - gram
        catt = jax.nn.softmax(gram_new, axis=-1)
        # out[p, i] = sum_j catt[i, j] * xc[p, j]  ==  xc @ catt^T
        out_c = jax.lax.dot_general(
            xc, catt.astype(xc.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [P, C]
        outc_ref[i] = (g_cam * out_c
                       + xc.astype(jnp.float32)).astype(outc_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dual_attention_pallas(x_pam: jax.Array, q: jax.Array, k: jax.Array,
                          v: jax.Array, gamma_pam: jax.Array,
                          x_cam: jax.Array, gamma_cam: jax.Array,
                          interpret: bool = False):
    """NHWC inputs; returns (pam_out, cam_out) shaped like the inputs."""
    b, h, w, c = x_pam.shape
    p = h * w
    cqk = q.shape[-1]
    xp = x_pam.reshape(b, p, c)
    qf = q.reshape(b, p, cqk)
    kf = k.reshape(b, p, cqk)
    vf = v.reshape(b, p, c)
    xc = x_cam.reshape(b, p, c)
    # gammas stay f32: Mosaic only supports 32-bit scalar vector.extracts,
    # so a bf16 gamma ref would fail to compile (the residual math runs in
    # f32 anyway via preferred_element_type)
    g_p = jnp.broadcast_to(gamma_pam.reshape(-1)[:1], (1,)).astype(
        jnp.float32)
    g_c = jnp.broadcast_to(gamma_cam.reshape(-1)[:1], (1,)).astype(
        jnp.float32)

    # several batch rows per grid step amortize grid overhead — but the
    # whole block must fit VMEM (~16 MB on v5e); budget half of it and
    # derive rows/step from the per-row residency (5 PxC tensors + q/k +
    # the PxP energy and CxC gram intermediates)
    bytes_per_row = 4 * (5 * p * c + 2 * p * cqk + p * p + c * c)
    nb = max(1, min(8, (8 << 20) // max(bytes_per_row, 1)))
    pad = (-b) % nb
    if pad:
        padcfg = [(0, pad), (0, 0), (0, 0)]
        xp = jnp.pad(xp, padcfg)
        qf = jnp.pad(qf, padcfg)
        kf = jnp.pad(kf, padcfg)
        vf = jnp.pad(vf, padcfg)
        xc = jnp.pad(xc, padcfg)
    bp = b + pad

    row = lambda i: (i, 0, 0)
    out_p, out_c = pl.pallas_call(
        _fused_kernel,
        grid=(bp // nb,),
        in_specs=[
            pl.BlockSpec((nb, p, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, p, cqk), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, p, cqk), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, p, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, p, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, p, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, p, c), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, p, c), x_pam.dtype),
            jax.ShapeDtypeStruct((bp, p, c), x_cam.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * (2 * p * p * cqk + 2 * p * p * c
                       + 2 * p * c * c + 2 * p * c * c),
            bytes_accessed=b * p * c * 4 * 6,
            transcendentals=b * (p * p + c * c),
        ),
        interpret=interpret,
    )(xp, qf, kf, vf, g_p, xc, g_c)
    return (out_p[:b].reshape(b, h, w, c),
            out_c[:b].reshape(b, h, w, c))
