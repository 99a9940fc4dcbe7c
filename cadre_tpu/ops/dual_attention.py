"""Position (PAM) and Channel (CAM) attention math — the DANet hot ops.

Behavioral contract (carla_perception/Networks/danet_blocks/da_att.py:19-83):
  PAM: q,k at C/8 channels via 1x1 conv, energy over HW positions, softmax
       over keys, out[p] = sum_k att[p,k] * v[:,k]; y = gamma*out + x.
  CAM: channel-by-channel gram energy over HW, row-max-subtraction trick,
       softmax over source channels, out[i] = sum_j att[i,j] x[j]; residual
       gamma-gated like PAM.

These are pure functions over NHWC tensors; the flax modules in
`cadre_tpu.models.danet` own the 1x1 conv params and call into here. The
fused Pallas kernel (`cadre_tpu.ops.pallas_dual_attention`) implements the
same math with one pass through VMEM per batch row; `fused_dual_attention`
dispatches to it on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pam_apply(x: jax.Array, q: jax.Array, k: jax.Array, v: jax.Array,
              gamma: jax.Array) -> jax.Array:
    """Position attention given projected q/k/v.

    x, v: [B,H,W,C]; q,k: [B,H,W,Cqk]. Returns [B,H,W,C].
    """
    b, h, w, c = x.shape
    p = h * w
    qf = q.reshape(b, p, -1)
    kf = k.reshape(b, p, -1)
    vf = v.reshape(b, p, c)
    energy = jnp.einsum("bpc,bqc->bpq", qf, kf,
                        preferred_element_type=jnp.float32)
    att = jax.nn.softmax(energy, axis=-1)
    out = jnp.einsum("bpq,bqc->bpc", att.astype(vf.dtype), vf,
                     preferred_element_type=jnp.float32)
    out = out.reshape(b, h, w, c).astype(x.dtype)
    return gamma * out + x


def cam_apply(x: jax.Array, gamma: jax.Array) -> jax.Array:
    """Channel attention (parameter-free except the gamma gate).

    x: [B,H,W,C]. energy[i,j] = <x_i, x_j> over HW; energy_new = rowmax - energy
    (the reference's max-subtraction trick); att = softmax_j; out_i = sum_j
    att[i,j] x_j.
    """
    b, h, w, c = x.shape
    xf = x.reshape(b, h * w, c)
    energy = jnp.einsum("bpc,bpd->bcd", xf, xf,
                        preferred_element_type=jnp.float32)
    energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
    att = jax.nn.softmax(energy_new, axis=-1)
    out = jnp.einsum("bcd,bpd->bpc", att.astype(xf.dtype), xf,
                     preferred_element_type=jnp.float32)
    out = out.reshape(b, h, w, c).astype(x.dtype)
    return gamma * out + x


def fused_dual_attention(x_pam: jax.Array, q: jax.Array, k: jax.Array,
                         v: jax.Array, gamma_pam: jax.Array,
                         x_cam: jax.Array, gamma_cam: jax.Array,
                         use_pallas: bool | None = None):
    """Compute PAM(x_pam) and CAM(x_cam) in one fused pass when possible.

    Returns (pam_out, cam_out). On TPU with compatible shapes this uses the
    Pallas kernel (one HBM round-trip per input); otherwise the XLA path.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        try:
            from cadre_tpu.ops.pallas_dual_attention import dual_attention_pallas

            return dual_attention_pallas(x_pam, q, k, v, gamma_pam, x_cam,
                                         gamma_cam)
        except Exception:
            pass
    return pam_apply(x_pam, q, k, v, gamma_pam), cam_apply(x_cam, gamma_cam)
