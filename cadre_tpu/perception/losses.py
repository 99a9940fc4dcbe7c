"""Multi-task perception losses.

Contract (Models/cal_losses.py, danet model type):
  - seg: weighted CrossEntropy scaled by target c*h*w (c=1 class-index map)
  - image/route recon: MSE scaled by c*h*w
  - light state: weighted CrossEntropy
  - light dist: L1
  - steer/throttle BC: MSE
  - KLD (VAE variants): mean over batch of -0.5*sum(1+logvar-mu^2-e^logvar)
Total weighting (Models/auto_trainer.py:267-298): seg*1 + 0.5*route +
0.1*light_state + bc steer + bc throttle (+ light_dist, recon, kld when the
corresponding heads are enabled).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def weighted_cross_entropy(logits: jax.Array, labels: jax.Array,
                           class_weight: Optional[jax.Array] = None
                           ) -> jax.Array:
    """torch nn.CrossEntropyLoss(weight=w) semantics: weighted mean of
    per-sample NLL with weights normalized by the selected classes' weights."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weight is None:
        return nll.mean()
    w = class_weight[labels]
    return (nll * w).sum() / jnp.maximum(w.sum(), 1e-12)


def seg_loss(seg_logits: jax.Array, seg_target: jax.Array,
             class_weight: Optional[jax.Array] = None) -> jax.Array:
    """seg_logits: [B,H,W,K]; seg_target: [B,H,W] int class map.
    Scaled by 1*h*w like the reference's c*h*w with a 1-channel target."""
    h, w = seg_target.shape[1], seg_target.shape[2]
    return weighted_cross_entropy(seg_logits, seg_target, class_weight) \
        * (h * w)


def recon_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """MSE * c*h*w (NHWC)."""
    c = target.shape[-1]
    h, w = target.shape[1], target.shape[2]
    return jnp.mean((pred - target) ** 2) * (c * h * w)


def light_state_loss(logits: jax.Array, labels: jax.Array,
                     class_weight: Optional[jax.Array] = None) -> jax.Array:
    return weighted_cross_entropy(logits, labels, class_weight)


def light_dist_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def bc_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def kld_loss(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    return jnp.mean(-0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar),
                                   axis=1))


def total_danet_loss(outputs: Dict[str, jax.Array], batch: Dict[str, Any],
                     cfg, seg_class_weight=None, light_class_weight=None,
                     light_weight: float = 0.1) -> tuple:
    """Weighted multi-task total for the production output mode 12.

    `light_weight` is the light-state CE coefficient
    (PerceptionTrainParams.w_light_state; auto_trainer.py:267-298 uses
    0.1). At 0.1 the term is ~5 orders of magnitude below the h*w-scaled
    seg CE, so the latent-z bottleneck never learns the light's HUE —
    the head detects the box (dist regression works) but classifies every
    visible light as the most common color (round-3/4 holdout: red class
    0.000 with perfectly color-separable data). Boosting to O(100) makes
    the light CE gradient into the shared encoder comparable to ~1% of
    the seg gradient, which is enough to carry hue through z."""
    losses: Dict[str, jax.Array] = {}
    total = jnp.zeros(())
    if cfg.pred_camera_seg:
        losses["seg"] = seg_loss(outputs["camera"], batch["camera_seg"],
                                 seg_class_weight)
        total = total + losses["seg"]
    else:
        losses["recon"] = recon_loss(outputs["camera"], batch["camera_rgb"])
        total = total + losses["recon"]
    if cfg.pred_route:
        losses["route"] = recon_loss(outputs["route"], batch["route_fig"])
        total = total + 0.5 * losses["route"]
    if cfg.pred_light_state:
        losses["light_state"] = light_state_loss(
            outputs["light_state"], batch["light_state"], light_class_weight)
        total = total + light_weight * losses["light_state"]
    if cfg.pred_light_dist:
        losses["light_dist"] = light_dist_loss(outputs["light_dist"][..., 0],
                                               batch["light_dist"])
        total = total + losses["light_dist"]
    if cfg.pred_bc:
        losses["steer"] = bc_loss(outputs["steer"], batch["steer"])
        losses["throttle"] = bc_loss(outputs["throttle"], batch["throttle"])
        total = total + losses["steer"] + losses["throttle"]
    if getattr(cfg, "pred_route_geom", False):
        # auxiliary (dis, theta) MSE on the PPO latent — weight comparable
        # to the BC terms; see DANetParams.pred_route_geom
        losses["route_geom"] = (
            bc_loss(outputs["route_geom"][:, 0], batch["dis"])
            + bc_loss(outputs["route_geom"][:, 1], batch["theta"]))
        # logged unweighted (raw MSE comparable across runs); weighted into
        # the total so the encoder gradient competes with the c*h*w-scaled
        # reconstruction terms (see DANetParams.route_geom_weight)
        total = total + getattr(cfg, "route_geom_weight", 1.0) \
            * losses["route_geom"]
    # VAE-family models expose gaussian latent heads -> KLD terms
    # (auto_trainer.py:300-303)
    if "mu" in outputs:
        losses["visual_kld"] = kld_loss(outputs["mu"], outputs["logvar"])
        total = total + losses["visual_kld"]
    if "bc_mu" in outputs:
        losses["bc_kld"] = kld_loss(outputs["bc_mu"], outputs["bc_logvar"])
        total = total + losses["bc_kld"]
    return total, losses
