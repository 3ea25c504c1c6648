"""IoU metrics as histogram reductions.

Reference: util/common_util.py:56-85 (intersectionAndUnion{,GPU}) — per-class
intersection/union/target histograms, all-reduced under DDP
(train_ScanNet_DDP_WarmUP.py:441-444). Here the histograms are computed with
one-hot segment sums (jit-able, static shapes); under data parallelism they
are psum'ed inside the sharded step.
"""

from __future__ import annotations

import jax.numpy as jnp


def intersection_and_union(
    pred: jnp.ndarray,    # [N] int predictions
    target: jnp.ndarray,  # [N] int labels
    num_classes: int,
    ignore_label: int = -100,
    mask: jnp.ndarray | None = None,
):
    """Returns (intersection [C], union [C], target_count [C]) float32."""
    valid = target != ignore_label
    if mask is not None:
        valid = valid & mask
    t = jnp.where(valid, target, num_classes)  # invalid -> overflow bin
    p = jnp.where(valid, pred, num_classes + 1)  # disjoint overflow bin

    def hist(x):
        return jnp.sum(
            x[:, None] == jnp.arange(num_classes)[None, :], axis=0
        ).astype(jnp.float32)

    area_t = hist(t)
    area_p = hist(p)
    inter = hist(jnp.where(p == t, t, num_classes))
    union = area_p + area_t - inter
    return inter, union, area_t


class AverageMeter:
    """Running average (reference: util/common_util.py:24-39)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
