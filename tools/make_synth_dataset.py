"""Generate a synthetic room dataset for end-to-end training demonstrations.

No ScanNet data ships with either repo (and this environment has no egress),
so training demos run on procedurally generated rooms whose semantics are
genuinely learnable: classes are tied to surface role (wall/floor/ceiling/
furniture types), colors are class-correlated with noise, and normals are
true face normals — the same (coord, color+normal, label) npz layout the
reference's prepare_data.py emits as .pth (data_preparation/prepare_data.py).

Usage: python tools/make_synth_dataset.py [--out data/synth] [--train 40]
       [--val 8] [--points 15000]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# class palette: index = semantic class, value = base RGB in [0,1]
PALETTE = np.array([
    [0.85, 0.85, 0.80],  # 0 wall
    [0.45, 0.30, 0.20],  # 1 floor
    [0.95, 0.95, 0.95],  # 2 ceiling
    [0.20, 0.45, 0.70],  # 3 table
    [0.70, 0.20, 0.20],  # 4 chair
    [0.20, 0.60, 0.30],  # 5 sofa
    [0.60, 0.55, 0.15],  # 6 cabinet
    [0.50, 0.25, 0.55],  # 7 clutter
], np.float32)
NUM_CLASSES = len(PALETTE)


def _plane(rng, n, origin, u, v, normal, cls):
    a = rng.uniform(0, 1, (n, 1))
    b = rng.uniform(0, 1, (n, 1))
    pts = origin + a * u + b * v + rng.normal(0, 0.004, (n, 3))
    nrm = np.tile(normal / np.linalg.norm(normal), (n, 1))
    return pts, nrm, np.full(n, cls, np.int64)


def _box(rng, n_per_face, center, size, cls, yaw):
    """5 visible faces of an axis-aligned box, rotated by yaw around z."""
    cx, cy, cz = center
    sx, sy, sz = size
    R = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                  [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]], np.float32)
    faces = [
        # origin(local), u, v, normal
        ((-sx / 2, -sy / 2, sz), (sx, 0, 0), (0, sy, 0), (0, 0, 1)),      # top
        ((-sx / 2, -sy / 2, 0), (sx, 0, 0), (0, 0, sz), (0, -1, 0)),      # -y
        ((-sx / 2, sy / 2, 0), (sx, 0, 0), (0, 0, sz), (0, 1, 0)),        # +y
        ((-sx / 2, -sy / 2, 0), (0, sy, 0), (0, 0, sz), (-1, 0, 0)),      # -x
        ((sx / 2, -sy / 2, 0), (0, sy, 0), (0, 0, sz), (1, 0, 0)),        # +x
    ]
    pts_all, nrm_all, lab_all = [], [], []
    for origin, u, v, nrm in faces:
        p, m, l = _plane(rng, n_per_face, np.array(origin, np.float32),
                         np.array(u, np.float32), np.array(v, np.float32),
                         np.array(nrm, np.float32), cls)
        pts_all.append(p)
        nrm_all.append(m)
        lab_all.append(l)
    pts = np.concatenate(pts_all) @ R.T + np.array([cx, cy, cz], np.float32)
    return pts.astype(np.float32), (np.concatenate(nrm_all) @ R.T).astype(np.float32), \
        np.concatenate(lab_all)


def make_room(seed: int, n_points: int):
    rng = np.random.default_rng(seed)
    W, D, H = rng.uniform(4.5, 8.0), rng.uniform(4.5, 8.0), rng.uniform(2.4, 3.2)

    surfaces = [
        # floor / ceiling / 4 walls: (origin, u, v, normal, class, area)
        ((0, 0, 0), (W, 0, 0), (0, D, 0), (0, 0, 1), 1, W * D),
        ((0, 0, H), (W, 0, 0), (0, D, 0), (0, 0, -1), 2, W * D),
        ((0, 0, 0), (W, 0, 0), (0, 0, H), (0, 1, 0), 0, W * H),
        ((0, D, 0), (W, 0, 0), (0, 0, H), (0, -1, 0), 0, W * H),
        ((0, 0, 0), (0, D, 0), (0, 0, H), (1, 0, 0), 0, D * H),
        ((W, 0, 0), (0, D, 0), (0, 0, H), (-1, 0, 0), 0, D * H),
    ]
    total_area = sum(s[-1] for s in surfaces)
    room_pts = int(n_points * 0.62)
    pts_list, nrm_list, lab_list = [], [], []
    for origin, u, v, nrm, cls, area in surfaces:
        n = max(64, int(room_pts * area / total_area))
        p, m, l = _plane(rng, n, np.array(origin, np.float32),
                         np.array(u, np.float32), np.array(v, np.float32),
                         np.array(nrm, np.float32), cls)
        pts_list.append(p)
        nrm_list.append(m)
        lab_list.append(l)

    # furniture boxes: class-dependent size priors
    size_prior = {3: (1.2, 0.8, 0.75), 4: (0.5, 0.5, 0.9), 5: (1.8, 0.9, 0.8),
                  6: (0.9, 0.5, 1.6), 7: (0.4, 0.4, 0.4)}
    n_boxes = rng.integers(5, 10)
    box_pts = (n_points - room_pts) // max(n_boxes, 1)
    for _ in range(n_boxes):
        cls = int(rng.integers(3, NUM_CLASSES))
        base = np.array(size_prior[cls], np.float32)
        size = base * rng.uniform(0.7, 1.3, 3).astype(np.float32)
        center = (rng.uniform(0.5, W - 0.5), rng.uniform(0.5, D - 0.5), 0.0)
        p, m, l = _box(rng, max(16, box_pts // 5), center, size, cls,
                       yaw=rng.uniform(0, np.pi))
        pts_list.append(p)
        nrm_list.append(m)
        lab_list.append(l)

    coord = np.concatenate(pts_list).astype(np.float32)
    norm = np.concatenate(nrm_list).astype(np.float32)
    label = np.concatenate(lab_list)
    color = PALETTE[label] + rng.normal(0, 0.06, (label.size, 3))
    color = np.clip(color, 0, 1).astype(np.float32)
    # center colors like the reference pipeline expects raw [0,1] RGB
    perm = rng.permutation(coord.shape[0])
    feats = np.concatenate([color, norm], axis=1)
    return coord[perm], feats[perm], label[perm]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/synth")
    ap.add_argument("--train", type=int, default=40)
    ap.add_argument("--val", type=int, default=8)
    ap.add_argument("--points", type=int, default=15000)
    args = ap.parse_args()

    for split, count, base_seed in (("train", args.train, 0),
                                    ("val", args.val, 10000)):
        d = os.path.join(args.out, split)
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            coord, feats, label = make_room(base_seed + i, args.points)
            np.savez(os.path.join(d, f"room{i:03d}.npz"), coords=coord,
                     feats=feats, labels=label, name=f"{split}_room{i:03d}")
        print(f"{split}: {count} scenes -> {d}")


if __name__ == "__main__":
    main()
