"""Static-shape packed batching for variable-size point-cloud pyramids.

The reference packs variable-size clouds into one [1, sum(N), C] tensor with
offset neighbor indices (datasetCommon.py:215-309 listToBatch). XLA requires
static shapes, so this module keeps the packed layout but pads every pyramid
level to a bucketed capacity and carries explicit validity masks + per-point
cloud ids. Masks feed BatchNorm/loss/metrics; cloud ids keep on-device kNN
within cloud boundaries. Padded rows have neighbor index 0 (clamped gathers
make this safe) and label = ignore_label.
"""

from __future__ import annotations

from typing import Sequence

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class PackedPyramid:
    """One packed, padded multi-scene batch. All leaves are jnp arrays.

    feats: [N0, C]; labels: [N0] int32; per level l:
    points[l] [Nl, 3], norms[l] [Nl, 3], masks[l] [Nl] bool, bids[l] [Nl] int32,
    edges_self[l] [Nl, K]; edges_forward[l] [N(l+1), K] (into level l);
    edges_propagate[l] [Nl, K] (into level l+1).
    """

    feats: jnp.ndarray
    labels: jnp.ndarray
    points: tuple
    norms: tuple
    masks: tuple
    bids: tuple
    edges_self: tuple
    edges_forward: tuple
    edges_propagate: tuple

    @property
    def num_levels(self) -> int:
        return len(self.points)


def round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def compute_level_caps(level_sizes: Sequence[int], bucket_multiple: int = 8192,
                       min_cap: int = 256) -> list[int]:
    """Bucketed per-level capacities: round each level's packed size up so
    recompilation only happens when a batch crosses a bucket boundary."""
    caps = []
    for s in level_sizes:
        m = max(min_cap, bucket_multiple)
        # geometric buckets below the multiple for small levels
        if s <= min_cap:
            caps.append(min_cap)
        elif s < m:
            c = min_cap
            while c < s:
                c *= 2
            caps.append(c)
        else:
            caps.append(round_up(s, m))
    return caps


def _pad_rows(arr: np.ndarray, cap: int, value=0) -> np.ndarray:
    pad = [(0, cap - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=value)


def pack_scenes(
    scenes: Sequence[dict],
    level_caps: Sequence[int] | None = None,
    bucket_multiple: int = 8192,
    ignore_label: int = -100,
    window_tile: int | None = None,
    window_size: int | None = None,
    window_sizes: Sequence[int] | None = None,
) -> PackedPyramid:
    """Pack per-scene pyramids (dicts from subsample_and_knn) into one padded batch.

    Each scene dict holds: 'feature_list' [N0, C], optional 'label_list' [N0],
    'point_list' / 'surface_normal_list' per level, and the three edge lists
    'nei_self_list' / 'nei_forward_list' / 'nei_propagate_list'.
    (Same keys as the reference dataloader items, scannet_data_loader:267-281.)

    window_tile set (e.g. 128) wraps every edge array in a WindowedEdges with
    precomputed tile windows (ops/window.py) — requires the scenes to be
    Morton-sorted per level (scene_to_item(morton=True)) so the per-tile
    unique-neighbor bound holds.
    """
    n_levels = len(scenes[0]["point_list"])
    # Under windowed gathers every scene's segment is aligned to the tile so
    # no window tile ever straddles two scenes — that keeps the per-tile
    # unique-neighbor bound a PER-SCENE property (estimate_window_sizes
    # measures scenes, not packed batches). Alignment gaps are ordinary
    # invalid rows: mask False, bid -1, edges 0, label ignored.
    align = window_tile if window_tile else 1

    def _seg_sizes(lvl):
        return [round_up(s["point_list"][lvl].shape[0], align) for s in scenes]

    # packed (pre-padding) sizes per level, alignment included
    sizes = [sum(_seg_sizes(l)) for l in range(n_levels)]
    if level_caps is None:
        level_caps = compute_level_caps(sizes, bucket_multiple)
    assert all(c >= s for c, s in zip(level_caps, sizes)), (level_caps, sizes)

    def _cat_aligned(arrs, lvl, value=0):
        """Concat per-scene arrays, each zero-padded to its aligned size."""
        segs = [_pad_rows(np.asarray(a), sz, value=value)
                for a, sz in zip(arrs, _seg_sizes(lvl))]
        return np.concatenate(segs, 0)

    points, norms, masks, bids = [], [], [], []
    edges_self, edges_forward, edges_propagate = [], [], []

    for lvl in range(n_levels):
        seg = _seg_sizes(lvl)
        offs = np.cumsum([0] + seg)
        pts = _cat_aligned([s["point_list"][lvl] for s in scenes],
                           lvl).astype(np.float32)
        nrm = _cat_aligned([s["surface_normal_list"][lvl] for s in scenes],
                           lvl).astype(np.float32)
        bid = _cat_aligned(
            [np.full(s["point_list"][lvl].shape[0], i, np.int32)
             for i, s in enumerate(scenes)], lvl, value=-1)
        cap = level_caps[lvl]
        mask = np.zeros(cap, bool)
        mask[: bid.shape[0]] = bid >= 0
        # Padded coords are 0 (NOT a far-away sentinel): huge sentinel values
        # overflow bf16 matmuls on padded rows into NaN, and NaN*0 poisons
        # parameter grads through BN reductions. kNN/stat exclusion of padding
        # is handled by masks/bids, never by coordinate magnitude.
        points.append(jnp.asarray(_pad_rows(pts, cap, value=0.0)))
        norms.append(jnp.asarray(_pad_rows(nrm, cap)))
        masks.append(jnp.asarray(mask))
        bids.append(jnp.asarray(_pad_rows(bid, cap, value=-1)))

        has_edges = "nei_self_list" in scenes[0]
        if not has_edges:
            # post_knn mode: edges are computed on device after packing
            # (pcf_tpu/data/post_knn.py); placeholders keep the pytree static.
            edges_self.append(jnp.zeros((cap, 1), jnp.int32))
            if lvl < n_levels - 1:
                edges_forward.append((np.zeros((0, 1), np.int32), level_caps[lvl + 1]))
                edges_propagate.append(jnp.zeros((cap, 1), jnp.int32))
            continue

        es = _cat_aligned(
            [s["nei_self_list"][lvl] + offs[i] for i, s in enumerate(scenes)],
            lvl).astype(np.int32)
        edges_self.append(jnp.asarray(_pad_rows(es, cap)))

        if lvl < n_levels - 1:
            # forward edges live at level lvl+1 and index into level lvl
            ef = _cat_aligned(
                [s["nei_forward_list"][lvl] + offs[i]
                 for i, s in enumerate(scenes)], lvl + 1).astype(np.int32)
            edges_forward.append((ef, level_caps[lvl + 1]))
            # propagate edges live at level lvl and index into level lvl+1
            offs_next = np.cumsum([0] + _seg_sizes(lvl + 1))
            ep = _cat_aligned(
                [s["nei_propagate_list"][lvl] + offs_next[i]
                 for i, s in enumerate(scenes)], lvl).astype(np.int32)
            edges_propagate.append(jnp.asarray(_pad_rows(ep, cap)))

    if window_tile and "nei_self_list" in scenes[0]:
        from pcf_tpu.ops.window import build_windows

        # Per-edge-kind window sizes (self, forward, propagate). Unique-
        # neighbor maxima are DATASET-dependent (denser scans dedup better),
        # so production pins them via estimate_window_sizes (data/scannet,
        # the pin_level_caps pattern); these built-in defaults carry a wide
        # margin over every dataset measured (flagship-synthetic maxima
        # 406/1073/298; sparse synth-rooms self-max 539). Resolve-kernel
        # cost scales with the window — pin tight sizes for speed.
        ws, wf, wp = window_sizes or (768, 1536, 512)
        if window_size:  # single explicit override for every kind
            ws = wf = wp = window_size

        def _win(arr, w):
            return build_windows(np.asarray(arr), tile=window_tile, window=w)

        edges_self = [_win(e, ws) for e in edges_self]
        edges_propagate = [_win(e, wp) for e in edges_propagate]
        edges_forward = tuple(
            _win(_pad_rows(ef, cap_next), wf) for ef, cap_next in edges_forward)
    else:
        edges_forward = tuple(
            jnp.asarray(_pad_rows(ef, cap_next)) for ef, cap_next in edges_forward
        )

    feats = _cat_aligned([s["feature_list"] for s in scenes], 0).astype(np.float32)
    feats = jnp.asarray(_pad_rows(feats, level_caps[0]))
    if "label_list" in scenes[0]:
        labels = _cat_aligned(
            [np.asarray(s["label_list"]).reshape(-1) for s in scenes], 0,
            value=ignore_label).astype(np.int32)
    else:
        labels = np.full(sizes[0], ignore_label, np.int32)
    labels = jnp.asarray(_pad_rows(labels.reshape(-1), level_caps[0], value=ignore_label))

    return PackedPyramid(
        feats=feats,
        labels=labels,
        points=tuple(points),
        norms=tuple(norms),
        masks=tuple(masks),
        bids=tuple(bids),
        edges_self=tuple(edges_self),
        edges_forward=edges_forward,
        edges_propagate=tuple(edges_propagate),
    )
