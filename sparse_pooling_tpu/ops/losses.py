"""Detection losses.

Capability parity with ``avod/core/losses.py``: weighted smooth-L1 for
localization/orientation regression and weighted softmax cross-entropy for
objectness/classification, with explicit sample masks (the minibatch
selection) instead of gathered sub-tensors — static shapes for XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1(pred, target, delta: float = 1.0):
    """Elementwise Huber/smooth-L1: 0.5 d^2 (|d|<delta) else delta(|d|-.5delta)."""

    d = jnp.abs(pred - target)
    return jnp.where(d < delta, 0.5 * d * d / delta, d - 0.5 * delta)


def weighted_smooth_l1(pred, target, weights, normalizer=None):
    """Sum smooth-L1 over the last axis, weight per sample, mean over weights.

    ``weights`` is the minibatch mask (possibly scaled); empty minibatches
    return 0 (guarded divide).
    """

    per = jnp.sum(smooth_l1(pred, target), axis=-1) * weights
    if normalizer is None:
        normalizer = jnp.sum(weights)
    return jnp.sum(per) / jnp.maximum(normalizer, 1.0)


def _logsumexp(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))


def weighted_softmax_ce(logits, labels_onehot, weights, normalizer=None):
    """Softmax cross-entropy per sample, weighted and normalized."""

    log_probs = logits - _logsumexp(logits)
    per = -jnp.sum(labels_onehot * log_probs, axis=-1) * weights
    if normalizer is None:
        normalizer = jnp.sum(weights)
    return jnp.sum(per) / jnp.maximum(normalizer, 1.0)


def focal_weight(probs, labels_onehot, gamma: float = 2.0):
    """Optional focal modulation (not in the reference; off by default)."""

    pt = jnp.sum(probs * labels_onehot, axis=-1)
    return (1.0 - pt) ** gamma
