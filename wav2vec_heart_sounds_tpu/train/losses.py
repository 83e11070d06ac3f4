"""Classification losses: cross-entropy, supervised contrastive, center, contrastive-focal.

Contract from reference src/mpcg_wav2vec/classify/losses.py:16-65: the vest runs train with
``beta * contrastive + alpha * CE + 0.01 * center`` (alpha .5, beta .2, temperature .7); the
center loss's learnable class centres join the optimizer. Centres live in a small params
pytree threaded through the jitted train step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  valid: jnp.ndarray | None = None) -> jnp.ndarray:
    per = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if valid is not None:
        w = valid.astype(per.dtype)
        return jnp.sum(per * w) / jnp.clip(jnp.sum(w), min=1.0)
    return jnp.mean(per)


def center_loss(centers: jnp.ndarray, features: jnp.ndarray,
                labels: jnp.ndarray) -> jnp.ndarray:
    """Mean squared distance of each feature to its learnable class centre."""
    return jnp.mean(jnp.sum((features - centers[labels]) ** 2, axis=1))


def supervised_contrastive(features: jnp.ndarray, labels: jnp.ndarray,
                           temperature: float = 0.7) -> jnp.ndarray:
    """Pull same-class features together / push different-class apart (cosine sim)."""
    feats = features / jnp.clip(jnp.linalg.norm(features, axis=1, keepdims=True), min=1e-12)
    sim = feats @ feats.T / temperature
    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=1, keepdims=True))

    n = labels.shape[0]
    same = labels[None, :] == labels[:, None]
    not_self = ~jnp.eye(n, dtype=bool)
    positives = same & not_self

    exp_sim = jnp.exp(sim) * not_self
    log_prob = sim - jnp.log(jnp.sum(exp_sim, axis=1, keepdims=True) + 1e-8)
    pos_counts = jnp.sum(positives, axis=1)
    has_pos = pos_counts > 0
    mean_log_prob = jnp.sum(log_prob * positives, axis=1) / jnp.clip(pos_counts, min=1)
    total = jnp.sum(jnp.where(has_pos, -mean_log_prob, 0.0))
    return total / jnp.clip(jnp.sum(has_pos), min=1)


@dataclass(frozen=True)
class ContrastiveFocalConfig:
    num_classes: int = 2
    feature_dim: int = 768
    alpha: float = 0.5          # CE weight
    beta: float = 0.2           # contrastive weight
    center_weight: float = 0.01
    temperature: float = 0.7
    use_center: bool = True


def init_contrastive_focal(key: jax.Array, cfg: ContrastiveFocalConfig) -> dict:
    """Loss-side trainable params (the class centres)."""
    if not cfg.use_center:
        return {}
    return {"centers": jax.random.normal(key, (cfg.num_classes, cfg.feature_dim))}


def contrastive_focal_loss(loss_params: dict, cfg: ContrastiveFocalConfig,
                           features: jnp.ndarray, logits: jnp.ndarray,
                           labels: jnp.ndarray,
                           valid: jnp.ndarray | None = None) -> jnp.ndarray:
    total = (cfg.beta * supervised_contrastive(features, labels, cfg.temperature)
             + cfg.alpha * cross_entropy(logits, labels, valid))
    if cfg.use_center and "centers" in loss_params:
        total = total + cfg.center_weight * center_loss(loss_params["centers"],
                                                        features, labels)
    return total
