"""AOT export for production serving.

The reference's deployment story is "ship the Python model code + a torch
checkpoint and re-build the module graph at load time"
(test_ScanNet_simple.py:108-127). The TPU-native story is ahead-of-time:
`jax.export` serializes the jitted eval forward as StableHLO, specialized to
the static bucket shapes the packed pipeline already guarantees
(core/batching.py). A serving process deserializes the artifact and runs —
no flax, no model code, no tracing, no compile-at-first-request; with
platforms=("cpu","tpu") one artifact runs on either backend.

Artifact layout (a directory):
  meta.json            config snapshot + bucket table + format version
  params.npz           flattened variables ("params/..." and "batch_stats/...")
  bucket_<i>.stablehlo serialized jax.export.Exported per bucket shape

The exported callable takes (flat_params_dict, feats, points..., edges...,
norms..., masks...) so the artifact's calling convention is stable against
flax pytree-structure changes.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Sequence

import numpy as np

FORMAT_VERSION = 1


def _flatten_variables(variables) -> dict:
    """Nested variables dict -> flat {"col/mod/.../name": np.ndarray}."""
    flat = {}

    def rec(prefix, node):
        if hasattr(node, "items"):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", variables)
    return flat


def _unflatten_variables(flat: dict) -> dict:
    nested: dict = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = nested
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return nested


def _batch_args(batch):
    """The exported calling convention's positional batch arguments."""
    return (batch.feats, list(batch.points), list(batch.edges_self),
            list(batch.edges_forward), list(batch.edges_propagate),
            list(batch.norms), list(batch.masks))


def _bucket_key(batch) -> tuple:
    return tuple(int(p.shape[0]) for p in batch.points)


def _json_safe(obj):
    if isinstance(obj, dict):
        return {str(k): _json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_json_safe(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


def export_artifact(cfg, variables, out_dir: str, example_batches,
                    platforms: Sequence[str] | None = None) -> dict:
    """Export the eval forward for every distinct bucket shape.

    example_batches: PackedPyramid batches (only shapes matter). Returns the
    meta dict. platforms=None exports for the default (current) backend.
    """
    import jax
    from jax import export as jexport

    from pcf_tpu.models import PointConvFormer_Segmentation

    os.makedirs(out_dir, exist_ok=True)
    model = PointConvFormer_Segmentation(cfg)
    flat = _flatten_variables(variables)
    np.savez(os.path.join(out_dir, "params.npz"), **flat)

    def fwd(flat_vars, feats, points, edges_self, edges_forward,
            edges_propagate, norms, masks):
        return model.apply(_unflatten_variables(flat_vars), feats, points,
                           edges_self, edges_forward, edges_propagate, norms,
                           masks=masks, train=False)

    jit_fwd = jax.jit(fwd)
    buckets, seen = [], set()
    for batch in example_batches:
        key = _bucket_key(batch)
        if key in seen:
            continue
        seen.add(key)
        args = (flat, *_batch_args(batch))
        specs = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            args)
        exp = jexport.export(
            jit_fwd,
            platforms=tuple(platforms) if platforms else None)(*specs)
        fname = f"bucket_{len(buckets)}.stablehlo"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        buckets.append({"file": fname, "level_caps": list(key)})

    meta = {
        "format_version": FORMAT_VERSION,
        "platforms": list(platforms) if platforms else None,
        "num_classes": int(cfg.num_classes),
        "grid_size": list(cfg.grid_size),
        "K_self": _json_safe(cfg.get("K_self")),
        "K_forward": _json_safe(cfg.get("K_forward")),
        "K_propagate": _json_safe(cfg.get("K_propagate")),
        "bucket_multiple": int(cfg.get("bucket_multiple", 8192)),
        "ignore_label": int(cfg.get("ignore_label", -100)),
        # serving must pack with the SAME window geometry the artifact was
        # traced with (the exported calling convention pins the WindowedEdges
        # pytree shapes) — persist it explicitly (ADVICE r1)
        "window": ({"tile": int(cfg.get("window_tile", 128)),
                    "sizes": _json_safe(list(cfg.window_sizes))
                    if cfg.get("window_sizes") else None,
                    "size": _json_safe(cfg.get("window_size"))}
                   if cfg.get("window_gather") else None),
        "buckets": buckets,
        "cfg": _json_safe(dict(cfg)),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ServingModel:
    """Loads an exported artifact and serves predictions.

    Needs only jax + numpy (no flax, no pcf_tpu.models): the forward is the
    deserialized StableHLO program, dispatched by bucket shape.
    """

    def __init__(self, out_dir: str):
        from jax import export as jexport

        with open(os.path.join(out_dir, "meta.json")) as f:
            self.meta = json.load(f)
        assert self.meta["format_version"] == FORMAT_VERSION, self.meta
        with np.load(os.path.join(out_dir, "params.npz")) as z:
            self.flat_vars = {k: z[k] for k in z.files}
        self._fns = {}
        for b in self.meta["buckets"]:
            with open(os.path.join(out_dir, b["file"]), "rb") as f:
                exp = jexport.deserialize(f.read())
            self._fns[tuple(b["level_caps"])] = exp.call

    @property
    def bucket_keys(self):
        return sorted(self._fns)

    def predict_packed(self, batch):
        """Logits [N0, num_classes] for a PackedPyramid in a known bucket."""
        key = _bucket_key(batch)
        if key not in self._fns:
            raise KeyError(
                f"batch bucket {key} not in artifact (have {self.bucket_keys});"
                " re-export with this bucket or repack with its level_caps")
        return self._fns[key](self.flat_vars, *_batch_args(batch))

    def predict_scene(self, coord, norm, feats, rng=None):
        """Full serving path for one raw scene, mirroring the eval pipeline
        (data/scannet.py:198-214): shift to origin, deterministic voxelize at
        grid_size[0], host pyramid, pack into a fitting artifact bucket,
        forward, then broadcast each voxel's prediction back to every raw
        point in that voxel. Returns (labels [n], probs [n, C]) in input
        order."""
        from pcf_tpu.core.batching import pack_scenes
        from pcf_tpu.data.pyramid import scene_to_item
        from pcf_tpu.ops.voxelize import voxel_cell_ids, voxelize

        m = self.meta
        coord = coord.astype(np.float32) - coord.min(0)
        uniq_idx = voxelize(coord, m["grid_size"][0], mode="deterministic")
        # raw point -> voxel group, in the same unique-cell-id order that
        # 'deterministic' lists the representatives in
        _, inverse = np.unique(voxel_cell_ids(coord, m["grid_size"][0]),
                               return_inverse=True)
        item = scene_to_item(
            coord[uniq_idx], norm.astype(np.float32)[uniq_idx],
            feats.astype(np.float32)[uniq_idx],
            np.zeros(len(uniq_idx), np.int32), m["grid_size"],
            m["K_self"], m["K_forward"], m["K_propagate"],
            rng=rng or np.random.default_rng(0),
            morton=m.get("window") is not None)
        caps = [list(k) for k in self.bucket_keys]
        sizes = [len(p) for p in item["point_list"]]
        fit = [c for c in caps if all(s <= cc for s, cc in zip(sizes, c))]
        if not fit:
            raise ValueError(
                f"scene pyramid sizes {sizes} exceed every artifact bucket "
                f"{caps}; re-export with a scene this large in the bucket set")
        win = m.get("window")
        try:
            batch = pack_scenes([item], level_caps=min(fit),
                                ignore_label=m["ignore_label"],
                                window_tile=win["tile"] if win else None,
                                window_size=win.get("size") if win else None,
                                window_sizes=win.get("sizes") if win else None)
        except ValueError as e:  # WindowOverflow: the traced pytree shapes
            # are pinned, so there is no plain-edge fallback inside a
            # windowed artifact — fail with the remedy spelled out
            raise ValueError(
                f"scene overflows the artifact's window sizes ({e}); "
                "re-export with larger window_sizes or window_gather=false"
            ) from e
        logits = np.asarray(self.predict_packed(batch), np.float32)
        z = logits[np.asarray(batch.masks[0])][inverse]
        e = np.exp(z - z.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        return probs.argmax(-1), probs


def main():
    p = argparse.ArgumentParser("pcf_tpu AOT export")
    p.add_argument("--config", required=True)
    p.add_argument("--pretrain_path", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--split", default="validation",
                   help="split whose scenes define the bucket shapes")
    p.add_argument("--max_scenes", type=int, default=8)
    p.add_argument("--platforms", default=None,
                   help="comma-separated, e.g. cpu,tpu (default: current)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE")
    a = p.parse_args()

    import jax

    from pcf_tpu.config import load_config
    from pcf_tpu.core.batching import pack_scenes
    from pcf_tpu.data.scannet import ScanNetDataset
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.train.checkpoint import CheckpointManager

    cfg = load_config(a.config, a.overrides)
    dataset = ScanNetDataset(cfg, split=a.split, seed=cfg.manual_seed)
    if cfg.get("window_gather") and not cfg.get("window_sizes"):
        # derive + persist window sizes exactly like the train loader, so
        # the artifact serves the benched windowed execution strategy
        from pcf_tpu.data.scannet import estimate_window_sizes

        cfg.window_sizes = estimate_window_sizes(
            [dataset], sample=cfg.get("level_caps_sample", 16),
            margin=cfg.get("window_margin", 1.3),
            tile=cfg.get("window_tile", 128), seed=cfg.manual_seed)
        print(f"derived window_sizes {tuple(cfg.window_sizes)}")
    batches = []
    for i in range(min(a.max_scenes, len(dataset))):
        batches.append(pack_scenes(
            [dataset[i]], bucket_multiple=cfg.bucket_multiple,
            level_caps=cfg.get("level_caps"), ignore_label=cfg.ignore_label,
            window_tile=(cfg.get("window_tile", 128)
                         if cfg.get("window_gather") else None),
            window_size=cfg.get("window_size"),
            window_sizes=cfg.get("window_sizes")))

    model = PointConvFormer_Segmentation(cfg)
    b = batches[0]
    variables = jax.jit(lambda k: model.init(
        k, *_batch_args(b)[:-1], masks=_batch_args(b)[-1], train=False)
    )(jax.random.PRNGKey(0))
    if a.pretrain_path:
        # optimizer-independent restore (CheckpointManager.restore_eval)
        params, batch_stats, ep = CheckpointManager(
            a.pretrain_path).restore_eval()
        assert params is not None, f"no checkpoint at {a.pretrain_path}"
        variables = {"params": params, "batch_stats": batch_stats}
        print(f"restored checkpoint epoch {ep} from {a.pretrain_path}")

    platforms = a.platforms.split(",") if a.platforms else None
    meta = export_artifact(cfg, variables, a.out, batches, platforms)
    print(json.dumps({"out": a.out,
                      "buckets": [bk["level_caps"] for bk in meta["buckets"]],
                      "platforms": meta["platforms"]}))


if __name__ == "__main__":
    main()
