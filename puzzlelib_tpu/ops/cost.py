"""Fused cost kernels: one XLA computation per cost producing
(device-resident scalar error, descent-direction gradient).

Semantics replicate the reference fused kernels
(/root/reference/Cuda/Kernels/Costs.py): gradients point in the descent
direction (optimizers *add* updates), the error scalar is pre-normalized by the
spatial extent only (the Cost layer divides by batch lazily), and the gradient
is normalized by batch (and where applicable, spatial/case counts).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _softmaxChannels(x):
    xf = x.astype(jnp.float32)
    m = jnp.max(xf, axis=1, keepdims=True)
    e = jnp.exp(xf - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("hasWeights", ))
def crossEntropy(scores, labels, weights, hasWeights=False):
    """scores (batch, classes, *spatial) raw logits; labels (batch, *spatial) int.

    Returns (devErr, grad): devErr = sum(-w[l] * log softmax[l]) / spatialDim,
    grad = w[c] * (onehot - softmax) / batch.
    """
    batch, ncases = scores.shape[0], scores.shape[1]
    spatial = int(np.prod(scores.shape[2:])) if scores.ndim > 2 else 1

    p = _softmaxChannels(scores)

    onehot = (labels[:, None] == jnp.arange(ncases, dtype=labels.dtype).reshape(
        (1, ncases) + (1, ) * (scores.ndim - 2))).astype(jnp.float32)

    if hasWeights:
        w = weights.astype(jnp.float32).reshape((1, ncases) + (1, ) * (scores.ndim - 2))
    else:
        w = jnp.asarray(1.0, jnp.float32)

    grad = (w * (onehot - p) / batch).astype(scores.dtype)

    logp = jnp.log(jnp.maximum(jnp.sum(p * onehot, axis=1), 1e-38))
    if hasWeights:
        wl = jnp.sum(w * onehot, axis=1)
        err = -jnp.sum(wl * logp) / spatial
    else:
        err = -jnp.sum(logp) / spatial

    return err, grad


@partial(jax.jit, static_argnames=("mode", ))
def svm(scores, labels, mode="l1"):
    """scores (batch, classes, *spatial) raw; labels int; cls = +-1 one-vs-rest."""
    batch, ncases = scores.shape[0], scores.shape[1]
    spatial = int(np.prod(scores.shape[2:])) if scores.ndim > 2 else 1

    onehot = labels[:, None] == jnp.arange(ncases, dtype=labels.dtype).reshape(
        (1, ncases) + (1, ) * (scores.ndim - 2))
    cls = jnp.where(onehot, 1.0, -1.0).astype(jnp.float32)

    sf = scores.astype(jnp.float32)
    margin = 1.0 - sf * cls

    if mode == "l1":
        grad = jnp.where(margin > 0, cls / ncases / batch, 0.0)
        err = jnp.sum(jnp.maximum(margin, 0.0)) / ncases / spatial
    else:
        hinge = jnp.maximum(margin, 0.0)
        grad = 2.0 * cls * hinge / ncases / batch
        err = jnp.sum(hinge * hinge) / ncases / spatial

    return err, grad.astype(scores.dtype)


@jax.jit
def bce(scores, labels):
    batch = scores.shape[0]
    spatial = int(np.prod(scores.shape[1:])) if scores.ndim > 1 else 1

    # flat elementwise pairing, as in the reference kernel (scores[i] vs labels[i])
    sf = scores.astype(jnp.float32).ravel()
    prob = jax.nn.sigmoid(sf)
    isOne = (labels.ravel() == 1)

    err = jnp.sum(jnp.where(isOne, -jnp.log(jnp.maximum(prob, 1e-38)),
                            -jnp.log(jnp.maximum(1.0 - prob, 1e-38)))) / spatial
    grad = (isOne.astype(jnp.float32) - prob) / batch / spatial

    return err, grad.reshape(scores.shape).astype(scores.dtype)


@jax.jit
def hinge(scores, labels):
    batch = scores.shape[0]
    ncases = int(np.prod(scores.shape[1:])) if scores.ndim > 1 else 1

    sf = scores.astype(jnp.float32)
    lf = labels.astype(jnp.float32)

    err = jnp.sum(jnp.maximum(0.0, 1.0 - sf * lf)) / ncases
    grad = jnp.where(sf * lf < 1.0, lf / batch / ncases, 0.0)

    return err, grad.astype(scores.dtype)


@jax.jit
def smoothL1(pred, target, norm, fullnorm):
    pf, tf = pred.astype(jnp.float32), target.astype(jnp.float32)
    diff = pf - tf
    sign = jnp.where(diff > 0, 1.0, -1.0)
    absd = diff * sign

    err = jnp.sum(jnp.where(absd < 1.0, diff * diff / 2.0 * norm, (absd - 0.5) * norm))
    grad = jnp.where(absd < 1.0, diff * fullnorm, sign * fullnorm)

    return err, grad.astype(pred.dtype)


@jax.jit
def l1Hinge(x1, x2, labels):
    """Pairwise l1-hinge embedding loss; labels (batch, ) int 0 (dissimilar) / 1."""
    batch = x1.shape[0]
    ncases = int(np.prod(x1.shape[1:])) if x1.ndim > 1 else 1

    d = x1.astype(jnp.float32) - x2.astype(jnp.float32)
    sign = jnp.where(d > 0, 1.0, -1.0)
    absd = d * sign

    lbl = labels.reshape((batch, ) + (1, ) * (x1.ndim - 1))
    isDissim = (lbl == 0)

    err = jnp.sum(jnp.where(isDissim, jnp.maximum(0.0, 1.0 - absd), absd)) / ncases
    g1 = jnp.where(isDissim, (absd < 1.0) * -sign, sign) / batch / ncases
    g2 = -g1

    return err, g1.astype(x1.dtype), g2.astype(x2.dtype)


@partial(jax.jit, static_argnames=("normTarget", ))
def kldiv(pred, target, normTarget):
    """KL divergence with softmax over axis 1 of pred; target is a distribution
    (optionally softmaxed too when normTarget)."""
    p = _softmaxChannels(pred)
    batch = pred.shape[0]

    t = _softmaxChannels(target) if normTarget else target.astype(jnp.float32)

    err = jnp.sum(t * (jnp.log(jnp.maximum(t, 1e-38)) - jnp.log(jnp.maximum(p, 1e-38)))) / batch
    grad = (t - p) / batch

    return err, grad.astype(pred.dtype)


@jax.jit
def mse(pred, target):
    c = 1.0 / int(np.prod(target.shape))
    grad = (target.astype(jnp.float32) - pred.astype(jnp.float32)) * c

    gradFlat = grad.ravel()
    err = jnp.dot(gradFlat, gradFlat) * int(np.prod(grad.shape)) * grad.shape[0] / 2.0

    return err, grad.astype(pred.dtype)


@jax.jit
def abscost(pred, target):
    batch = pred.shape[0]
    norm = 1.0 / int(np.prod(target.shape))

    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    err = jnp.sum(jnp.abs(diff)) / (int(np.prod(target.shape[1:])) if target.ndim > 1 else 1)
    grad = jnp.where(diff > 0, -norm, norm)

    return err, grad.astype(pred.dtype)


@jax.jit
def accuracy(pred, labels):
    return jnp.sum(pred != labels).astype(jnp.float32)
