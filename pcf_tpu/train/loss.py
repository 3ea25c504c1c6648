"""Segmentation loss: weighted cross-entropy with label smoothing + ignore.

Reference semantics: torch nn.CrossEntropyLoss(weight, ignore_index=-100,
label_smoothing) as configured in train_ScanNet_DDP_WarmUP.py:198-222.
Per-sample loss is scaled by the target-class weight and the mean is taken
over the summed weights (torch 'weighted mean' reduction). Padded rows are
excluded via the validity mask in addition to ignore_label.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jnp.ndarray,           # [N, C]
    labels: jnp.ndarray,           # [N] int
    mask: jnp.ndarray | None = None,  # [N] bool (padding)
    class_weights: jnp.ndarray | None = None,  # [C]
    label_smoothing: float = 0.0,
    ignore_label: int = -100,
    axis_name: str | None = None,
):
    """Returns (scalar loss, valid_count). Safe under ignore-everything batches.

    axis_name: psum the weighted-sum numerator AND the weight denominator
    over that mesh axis before dividing — the globally-correct loss when the
    point dim is sharded (parallel/spatial.py), identical to the unsharded
    value (same sums, reassociated)."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_label
    if mask is not None:
        valid = valid & mask
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]

    if class_weights is not None:
        cw = class_weights.astype(jnp.float32)
        wy = jnp.take(cw, safe_labels)
    else:
        cw = jnp.ones((num_classes,), jnp.float32)
        wy = jnp.ones_like(nll)
    wy = jnp.where(valid, wy, 0.0)

    # torch formula: (1-eps)*w_y*nll + eps * sum_c(w_c * -logp_c)/C,
    # reduced by sum(w_y) (verified against torch.nn.CrossEntropyLoss).
    per = (1.0 - label_smoothing) * wy * nll
    if label_smoothing > 0.0:
        smooth = jnp.sum(-logp * cw[None, :], axis=-1) / num_classes
        per = per + label_smoothing * jnp.where(valid, smooth, 0.0)

    total_w = jnp.sum(wy)
    num = jnp.sum(per)
    n_valid = jnp.sum(valid)
    if axis_name is not None:
        total_w = jax.lax.psum(total_w, axis_name)
        num = jax.lax.psum(num, axis_name)
        n_valid = jax.lax.psum(n_valid, axis_name)
    loss = num / jnp.maximum(total_w, 1e-8)
    return loss, n_valid
