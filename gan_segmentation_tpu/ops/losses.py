"""Segmentation losses.

Replicates the reference's loss semantics exactly:

- ``weighted_softmax_ce``: gluon ``SoftmaxCELoss(axis=1)`` with an explicit
  sample_weight (`seg_solver.py:400-407`): per-pixel CE multiplied by the
  weight, then **mean over every non-batch dim including ignored pixels**
  (normalization by total, not valid, pixel count — this sets the reference's
  gradient scale and is preserved bit-for-bit).
- ``softmax_ce_valid_norm``: the deeplab library's
  ``SoftmaxCrossEntropyLoss`` built on ``F.SoftmaxOutput(use_ignore,
  normalization='valid')`` (`lib/model/loss.py:243-254`) — forward value is a
  mean over all pixels with ignored zeroed; the 'valid' normalization only
  affects mxnet's fused gradient, so for a value+autodiff framework we expose
  ``valid_norm=True`` to divide by the valid count instead.
- Focal variants: `lib/model/loss.py:7-211`.

All take NHWC logits and (N,H,W) integer labels (ignore label -1).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _pick_class(values, labels):
    """``values[..., labels]`` per pixel WITHOUT a gather.

    ``take_along_axis`` lowers to a per-element gather — measured at
    ~27 ms/step each on the b8/480² DeepLab train step (the two loss
    gathers were 43% of the whole step). The one-hot compare+select+reduce
    over the (small) class axis fuses into one bandwidth-bound pass.
    """
    c = values.shape[-1]
    onehot = labels[..., None] == jnp.arange(c, dtype=labels.dtype)
    return jnp.sum(jnp.where(onehot, values, 0.0), axis=-1)


def _per_pixel_ce(logits, labels):
    """-log softmax(logits) picked at labels. labels clipped for the pick."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    return -_pick_class(logp, safe)


def weighted_softmax_ce(logits, labels, sample_weight):
    """Per-sample loss vector (N,), gluon SoftmaxCELoss semantics."""
    ce = _per_pixel_ce(logits, labels) * sample_weight.astype(jnp.float32)
    return jnp.mean(ce, axis=tuple(range(1, ce.ndim)))


def softmax_ce_with_ignore(logits, labels, ignore_label: int = -1):
    """weighted CE with weight = (label != ignore); returns (N,) like gluon."""
    w = (labels != ignore_label).astype(jnp.float32)
    return weighted_softmax_ce(logits, labels, w)


def softmax_ce_valid_norm(logits, labels, ignore_label: int = -1):
    """Scalar CE normalized by the number of valid pixels (SoftmaxOutput
    ``normalization='valid'`` gradient semantics)."""
    mask = (labels != ignore_label).astype(jnp.float32)
    ce = _per_pixel_ce(logits, labels) * mask
    return jnp.sum(ce) / jnp.maximum(jnp.sum(mask), 1.0)


def normalized_focal_loss_softmax(logits, labels, *, gamma: float = 2.0,
                                  ignore_label: int = -1, eps: float = 1e-10,
                                  size_average: bool = True):
    """`lib/model/loss.py:7-63`. Returns (per-sample loss (N,), mean mult).

    beta = (1-pt)^gamma, renormalized per sample so sum(beta) == num valid.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    pt = _pick_class(probs, safe)
    valid = labels != ignore_label
    pt = jnp.where(valid, pt, 1.0)
    beta = (1.0 - pt) ** gamma

    reduce_axes = (-2, -1)
    t_sum = jnp.sum(valid.astype(jnp.float32), axis=reduce_axes, keepdims=True)
    beta_sum = jnp.sum(beta, axis=reduce_axes, keepdims=True)
    mult = t_sum / (beta_sum + eps)
    beta = beta * mult

    loss = -beta * jnp.log(jnp.minimum(pt + eps, 1.0))
    nb = tuple(range(1, loss.ndim))
    if size_average:
        tsum = jnp.sum(valid.astype(jnp.float32), axis=nb)
        loss = jnp.sum(loss, axis=nb) / (tsum + eps)
    else:
        loss = jnp.sum(loss, axis=nb)
    return loss, jnp.mean(mult)


def area_normalized_focal_loss_softmax(logits, labels, area_weights, *,
                                       gamma: float = 2.0,
                                       area_gamma: float = 0.5,
                                       ignore_label: int = -1,
                                       eps: float = 1e-10,
                                       size_average: bool = True):
    """`lib/model/loss.py:66-113`: focal beta additionally weighted by
    per-pixel ``area_weights ** area_gamma`` before renormalization."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    pt = _pick_class(probs, safe)
    valid = labels != ignore_label
    pt = jnp.where(valid, pt, 1.0)
    beta = ((1.0 - pt) ** gamma) * (area_weights.astype(jnp.float32)
                                    ** area_gamma)
    reduce_axes = (-2, -1)
    t_sum = jnp.sum(valid.astype(jnp.float32), axis=reduce_axes, keepdims=True)
    beta_sum = jnp.sum(beta, axis=reduce_axes, keepdims=True)
    mult = t_sum / (beta_sum + eps)
    beta = beta * mult
    loss = -beta * jnp.log(jnp.minimum(pt + eps, 1.0))
    nb = tuple(range(1, loss.ndim))
    if size_average:
        tsum = jnp.sum(valid.astype(jnp.float32), axis=nb)
        loss = jnp.sum(loss, axis=nb) / (tsum + eps)
    else:
        loss = jnp.sum(loss, axis=nb)
    return loss, jnp.mean(mult)


def normalized_focal_loss_sigmoid(logits, labels, *, alpha: float = 0.25,
                                  gamma: float = 2.0, eps: float = 1e-12,
                                  size_average: bool = True,
                                  scale: float = 1.0, normalize: bool = True):
    """`lib/model/loss.py:123-171` (sigmoid focal with per-sample beta
    renormalization)."""
    pred = jax.nn.sigmoid(logits.astype(jnp.float32))
    one_hot = labels > 0
    pt = jnp.where(one_hot, pred, 1.0 - pred)
    t = jnp.ones_like(pt)
    alpha_w = jnp.where(one_hot, alpha * t, (1.0 - alpha) * t)
    beta = (1.0 - pt) ** gamma
    mult = jnp.ones(())
    if normalize:
        reduce_axes = (-2, -1)
        t_sum = jnp.sum(t, axis=reduce_axes, keepdims=True)
        beta_sum = jnp.sum(beta, axis=reduce_axes, keepdims=True)
        mult = t_sum / (beta_sum + eps)
        beta = beta * mult
    loss = -alpha_w * beta * jnp.log(jnp.minimum(pt + eps, 1.0))
    sample_weight = (labels != -1).astype(jnp.float32)
    loss = loss * sample_weight
    nb = tuple(range(1, loss.ndim))
    if size_average:
        tsum = jnp.sum(sample_weight, axis=nb)
        loss = jnp.sum(loss, axis=nb) / (tsum + eps)
    else:
        loss = jnp.sum(loss, axis=nb)
    return scale * loss, jnp.mean(mult)


def focal_loss_sigmoid(logits, labels, *, alpha: float = 0.25, gamma: float = 2.0,
                       eps: float = 1e-9, size_average: bool = True,
                       scale: float = 1.0):
    """`lib/model/loss.py:174-211` (binary sigmoid focal, ignore==-1)."""
    pred = jax.nn.sigmoid(logits.astype(jnp.float32))
    one_hot = labels > 0
    pt = jnp.where(one_hot, pred, 1.0 - pred)
    t = (labels != -1).astype(jnp.float32)
    alpha_w = jnp.where(one_hot, alpha * t, (1.0 - alpha) * t)
    beta = (1.0 - pt) ** gamma
    loss = -alpha_w * beta * jnp.log(jnp.minimum(pt + eps, 1.0))
    loss = loss * t
    nb = tuple(range(1, loss.ndim))
    if size_average:
        tsum = jnp.sum((labels == 1).astype(jnp.float32), axis=nb)
        loss = jnp.sum(loss, axis=nb) / (tsum + eps)
    else:
        loss = jnp.sum(loss, axis=nb)
    return scale * loss


def seg_loss_with_aux(pred, aux_pred, labels, *, aux_weight: float = 0.5,
                      ignore_label: int = -1):
    """``SegmentationLoss01`` (`01/main.py:160-182`): CE(final) +
    aux_weight * CE(aux), ignore-weighted, per-sample vectors summed."""
    w = (labels != ignore_label).astype(jnp.float32)
    loss1 = weighted_softmax_ce(pred, labels, w)
    loss2 = weighted_softmax_ce(aux_pred, labels, w)
    return loss1 + aux_weight * loss2
