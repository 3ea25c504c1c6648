"""End-to-end pipeline tests: dataset -> packed loader -> train steps ->
checkpoint save/restore -> simple + voting eval with real output files.

This is the pytest-scale analog of the reference's only end-to-end check
(tests_pointconv/test_modelnet10.py) plus the eval flows of
test_ScanNet_simple.py / test_ScanNet_voting.py — on synthetic scenes.
"""

import os

import numpy as np
import pytest

from pcf_tpu.config import Config, get_default_configs, get_default_training_cfgs
from pcf_tpu.data import synthetic_scene

GRID = [0.35, 0.7, 1.4]
NCLS = 5


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scannet_like")
    for split in ("train", "val"):
        os.makedirs(d / split, exist_ok=True)
        for i in range(3):
            coord, norm, feats, labels = synthetic_scene(
                400, extent=4.0, num_classes=NCLS, seed=hash(split) % 100 + i)
            np.savez(d / split / f"scene{i}.npz",
                     coords=coord, feats=np.concatenate([feats, norm], 1),
                     labels=labels, name=f"{split}_scene{i}")
    return d


def _cfg(scene_dir, **kw):
    cfg = get_default_configs(Config(), num_level=3, base_dim=8)
    cfg = get_default_training_cfgs(cfg)
    cfg.update(
        guided_level=0, num_heads=2, resblocks=[0, 1, 1], mid_dim=[4, 4, 4],
        grid_size=GRID, num_classes=NCLS, learning_rate=0.01,
        scheduler="MultiStepWithWarmup", milestones=[1000], warmup_epochs=1,
        BATCH_SIZE=2, bucket_multiple=256, MAX_POINTS_NUM=100000,
        train_data_path=str(scene_dir / "train" / "*.npz"),
        val_data_path=str(scene_dir / "val" / "*.npz"),
        test_data_path=str(scene_dir / "val" / "*.npz"),
        K_self=[8] * 3, K_forward=[8] * 3, K_propagate=[8] * 3,
        total_epoches=1, eval_freq=1, save_freq=1, print_freq=100,
    )
    cfg.update(kw)
    return cfg


def test_empty_glob_fails_loudly(scene_dir, tmp_path):
    """An empty data glob must raise, not let downstream evals score a
    silent mIoU 0.0 with exit 0 (seen in a fresh-machine battery run)."""
    from pcf_tpu.data.scannet import ScanNetDataset

    cfg = _cfg(scene_dir, val_data_path=str(tmp_path / "nothing" / "*.npz"))
    with pytest.raises(FileNotFoundError, match="no validation scenes"):
        ScanNetDataset(cfg, "validation", seed=0)


def test_dataset_and_loader(scene_dir):
    from pcf_tpu.data.scannet import PackedLoader, ScanNetDataset

    cfg = _cfg(scene_dir)
    ds = ScanNetDataset(cfg, "training", seed=0)
    assert len(ds) == 3
    assert len(cfg.weights) == NCLS  # USE_WEIGHT populated (datasetCommon.py:70-90)
    item = ds[0]
    assert len(item["point_list"]) == 3
    assert item["feature_list"].shape[1] == 3

    loader = PackedLoader(ds, batch_size=2, bucket_multiple=256, seed=0)
    batches = list(loader)
    assert len(batches) == 1  # 3 scenes, batch 2, drop_last
    b = batches[0]
    assert b.feats.shape[0] == b.points[0].shape[0]


def test_abandoned_loader_releases_producer_thread(scene_dir):
    """Breaking out of iteration must not leak the producer thread blocked
    in q.put (observed: leaked producers survived whole test sessions)."""
    import threading
    import time

    from pcf_tpu.data.scannet import PackedLoader, ScanNetDataset

    cfg = _cfg(scene_dir)
    ds = ScanNetDataset(cfg, "training", seed=0)
    loader = PackedLoader(ds, batch_size=1, bucket_multiple=256, seed=0,
                          prefetch=1, drop_last=False)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # consumer abandons mid-epoch (GeneratorExit path)
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_loader_per_host_sharding(scene_dir):
    from pcf_tpu.data.scannet import PackedLoader, ScanNetDataset

    cfg = _cfg(scene_dir, BATCH_SIZE=1)
    ds = ScanNetDataset(cfg, "training", seed=0)
    seen = []
    for rank in range(2):
        loader = PackedLoader(ds, 1, shuffle=False, process_index=rank,
                              process_count=2, bucket_multiple=256)
        seen.append(len(list(loader)))
    assert sum(seen) == 3  # all scenes covered once across hosts


def test_train_eval_checkpoint_roundtrip(scene_dir, tmp_path):
    """Loss decreases over a few steps; checkpoint restores exactly; simple
    eval runs end-to-end and writes .ply/.txt/.npy outputs."""
    import jax

    from pcf_tpu.data.scannet import ScanNetDataset, PackedLoader
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.parallel import make_train_step
    from pcf_tpu.train.checkpoint import CheckpointManager
    from pcf_tpu.train.state import create_train_state, make_optimizer

    cfg = _cfg(scene_dir, shuffle_index=False, rotate_aug=False,
               scale_aug=False, color_aug=False)
    ds = ScanNetDataset(cfg, "training", seed=0)
    caps = [1024, 512, 256]
    loader = PackedLoader(ds, 2, level_caps=caps, seed=0)
    batch = next(iter(loader))

    model = PointConvFormer_Segmentation(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch.feats, list(batch.points),
        list(batch.edges_self), list(batch.edges_forward),
        list(batch.edges_propagate), list(batch.norms),
        masks=list(batch.masks), train=False)
    tx, _ = make_optimizer(cfg, iter_per_epoch=10)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg, class_weights=cfg.weights)

    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses  # learning happens

    # checkpoint roundtrip (resume path the reference lacks, SURVEY.md §5)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, {"miou": 0.5})
    template = create_train_state(variables, tx)
    restored, epoch = mgr.restore(template)
    assert epoch == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()

    # optimizer-independent eval restore: must work with NO optimizer
    # template (checkpoints from older optimizer reworks stay loadable)
    params, batch_stats, epoch = CheckpointManager(
        str(tmp_path / "ckpt")).restore_eval()
    assert epoch == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert batch_stats is not None

    # simple eval on the val split with the trained state
    from pcf_tpu.eval.simple import evaluate

    cfg.eval_path = str(tmp_path / "eval")
    miou, avg_time = evaluate(cfg, split="validation", state=state,
                              max_scenes=1)
    assert 0.0 <= miou <= 1.0
    outs = os.listdir(cfg.eval_path)
    assert any(f.endswith(".ply") for f in outs)
    assert any(f.endswith(".txt") for f in outs)
    assert any(f.endswith("_probs.npy") for f in outs)


def test_ply_roundtrip(tmp_path, rng):
    from pcf_tpu.eval.io import read_ply, write_ply_color, NYU40_COLORMAP, remap_20_to_nyu40

    pts = rng.normal(size=(50, 3)).astype(np.float32)
    labels = rng.integers(0, 20, size=(50,))
    path = str(tmp_path / "x.ply")
    write_ply_color(path, pts, labels)
    rpts, rcols = read_ply(path)
    np.testing.assert_allclose(rpts, pts, atol=1e-6)
    expect = np.asarray(NYU40_COLORMAP, np.uint8)[remap_20_to_nyu40(labels)]
    np.testing.assert_array_equal(rcols, expect)


def test_voting_eval_covers_all_points(scene_dir, tmp_path):
    import jax

    from pcf_tpu.data.scannet import ScanNetDataset, PackedLoader
    from pcf_tpu.eval.voting import evaluate_voting
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.train.state import create_train_state, make_optimizer

    cfg = _cfg(scene_dir)
    ds = ScanNetDataset(cfg, "validation", seed=0)
    loader = PackedLoader(ds, 1, bucket_multiple=256, shuffle=False,
                          drop_last=False)
    batch = next(iter(loader))
    model = PointConvFormer_Segmentation(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch.feats, list(batch.points),
        list(batch.edges_self), list(batch.edges_forward),
        list(batch.edges_propagate), list(batch.norms),
        masks=list(batch.masks), train=False)
    tx, _ = make_optimizer(cfg, 1)
    state = create_train_state(variables, tx)

    cfg.eval_path = str(tmp_path / "vote_eval")
    miou = evaluate_voting(cfg, state=state, vote_num=2, max_scenes=1)
    assert 0.0 <= miou <= 1.0
    assert any(f.endswith(".ply") for f in os.listdir(cfg.eval_path))

    # packing several chunks per forward (vote_batch, VERDICT r1 weak #5)
    # must reproduce the one-chunk-per-forward accumulation exactly
    probs_batched = {f: np.load(os.path.join(cfg.eval_path, f))
                     for f in os.listdir(cfg.eval_path)
                     if f.endswith("_probs.npy")}
    assert probs_batched
    cfg.eval_path = str(tmp_path / "vote_eval_single")
    cfg.vote_batch = 1
    miou_single = evaluate_voting(cfg, state=state, vote_num=2, max_scenes=1)
    assert miou_single == pytest.approx(miou)
    for f, arr in probs_batched.items():
        np.testing.assert_allclose(
            np.load(os.path.join(cfg.eval_path, f)), arr, atol=1e-6)


def test_voting_eval_device_pyramid(scene_dir, tmp_path):
    """Voting with the on-device pyramid (VERDICT r3 #4: the per-(scene,
    rotation) covering-set builds were the 5x host-bound term): items ship
    level 0 only, subsample + kNN run on device, coverage and accumulation
    semantics are unchanged. MAX_POINTS_NUM forces the oversized-chunk
    rebuild path through the mode-aware _build_item."""
    import jax

    from pcf_tpu.data.scannet import ScanNetDataset, PackedLoader
    from pcf_tpu.eval.voting import evaluate_voting
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.train.state import create_train_state, make_optimizer

    cfg = _cfg(scene_dir, device_pyramid=True, knn_method="exact",
               MAX_POINTS_NUM=300)
    ds = ScanNetDataset(cfg, "validation", seed=0)
    loader = PackedLoader(ds, 1, bucket_multiple=256, shuffle=False,
                          drop_last=False)
    batch = next(iter(loader))
    from pcf_tpu.data.post_knn import prepare
    batch = prepare(batch, cfg)
    model = PointConvFormer_Segmentation(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch.feats, list(batch.points),
        list(batch.edges_self), list(batch.edges_forward),
        list(batch.edges_propagate), list(batch.norms),
        masks=list(batch.masks), train=False)
    tx, _ = make_optimizer(cfg, 1)
    state = create_train_state(variables, tx)

    cfg.eval_path = str(tmp_path / "vote_eval_device")
    miou = evaluate_voting(cfg, state=state, vote_num=2, max_scenes=1)
    assert 0.0 <= miou <= 1.0
    assert any(f.endswith("_probs.npy") for f in os.listdir(cfg.eval_path))


def test_voting_eval_post_knn_keeps_host_pyramid(scene_dir, tmp_path):
    """post_knn-only voting (host-built pyramid, device edges): the r5
    fused dispatch must NOT reroute this mode through the device-pyramid
    rebuild (r5 review finding) — the host pyramid's subsample semantics
    are the mode's contract. Accumulation must match the plain host path
    bitwise on the same scene and variables."""
    import jax

    from pcf_tpu.data.scannet import ScanNetDataset, PackedLoader
    from pcf_tpu.eval.voting import evaluate_voting
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.train.state import create_train_state, make_optimizer

    cfg = _cfg(scene_dir, post_knn=True, knn_method="exact")
    ds = ScanNetDataset(cfg, "validation", seed=0)
    loader = PackedLoader(ds, 1, bucket_multiple=256, shuffle=False,
                          drop_last=False)
    batch = next(iter(loader))
    from pcf_tpu.data.post_knn import prepare
    batch = prepare(batch, cfg)
    model = PointConvFormer_Segmentation(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch.feats, list(batch.points),
        list(batch.edges_self), list(batch.edges_forward),
        list(batch.edges_propagate), list(batch.norms),
        masks=list(batch.masks), train=False)
    tx, _ = make_optimizer(cfg, 1)
    state = create_train_state(variables, tx)

    cfg.eval_path = str(tmp_path / "vote_pk")
    miou = evaluate_voting(cfg, state=state, vote_num=2, max_scenes=1)
    assert 0.0 <= miou <= 1.0

    # the host (no post_knn) path with exact kNN must agree: post_knn is
    # an execution-placement change, not a semantics change
    cfg_host = _cfg(scene_dir, knn_method="exact")
    cfg_host.eval_path = str(tmp_path / "vote_host")
    miou_host = evaluate_voting(cfg_host, state=state, vote_num=2,
                                max_scenes=1)
    assert miou == pytest.approx(miou_host, abs=1e-6)


def test_pinned_level_caps_identical_shapes(scene_dir):
    """Mesh-mode requirement (VERDICT r1 #4): with pin_level_caps, every
    batch from both loaders has identical static shapes, so stack_batches
    never mismatches and XLA compiles the step once."""
    from pcf_tpu.data.scannet import getdataLoaders

    cfg = _cfg(scene_dir, BATCH_SIZE=1, pin_level_caps=True,
               level_caps_sample=3)
    train_loader, val_loader, _, _ = getdataLoaders(cfg)
    assert cfg.level_caps is not None and len(cfg.level_caps) == 3
    shapes = set()
    for loader in (train_loader, val_loader):
        for b in loader:
            shapes.add(tuple(p.shape for p in b.points)
                       + tuple(e.shape for e in b.edges_self))
    assert len(shapes) == 1, shapes


def test_group_batches_pads_val_tail(scene_dir):
    """validate() must cover every scene: the final partial device-group is
    padded by repeating the last batch and n_real marks the true count."""
    from pcf_tpu.data.scannet import PackedLoader, ScanNetDataset
    from pcf_tpu.train.trainer import _group_batches

    cfg = _cfg(scene_dir, BATCH_SIZE=1)
    ds = ScanNetDataset(cfg, "validation", seed=0)
    loader = PackedLoader(ds, 1, shuffle=False, drop_last=False,
                          level_caps=[1024, 512, 256])
    groups = list(_group_batches(loader, 2, pad_tail=True))
    # 3 scenes, group=2 -> one full group + one padded tail
    assert [n for _, n in groups] == [2, 1]
    assert all(len(g) == 2 for g, _ in groups)
    # without pad_tail the tail is dropped (training behavior)
    groups = list(_group_batches(loader, 2))
    assert [n for _, n in groups] == [2]


def test_greedy_fit_splits_oversized_batches(scene_dir):
    """With tight pinned caps, the loader emits short batches instead of
    overflowing; no scene is dropped and shapes stay fixed."""
    from pcf_tpu.data.scannet import PackedLoader, ScanNetDataset

    cfg = _cfg(scene_dir, BATCH_SIZE=3)
    ds = ScanNetDataset(cfg, "validation", seed=0)
    # caps sized for ~1 scene at level 0 force one scene per batch
    item = ds[0]
    tight = [int(item["point_list"][l].shape[0] * 1.5) for l in range(3)]
    loader = PackedLoader(ds, 3, shuffle=False, drop_last=False,
                          level_caps=tight)
    batches = list(loader)
    assert len(batches) >= 2  # split instead of one overflowing batch of 3
    total_valid = sum(int(np.asarray(b.masks[0]).sum()) for b in batches)
    expected = sum(ds[i]["point_list"][0].shape[0] for i in range(3))
    assert total_valid == expected  # every point of every scene survives


def test_grad_accumulation_semantics(scene_dir):
    """accum_iter=k (optax.MultiSteps): params move only every k-th step, and
    the accumulated update equals one step on the mean gradient (reference:
    train_ScanNet_DDP_WarmUP.py:371-374,418-424)."""
    import jax

    from pcf_tpu.data.scannet import PackedLoader, ScanNetDataset
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.parallel import make_train_step
    from pcf_tpu.train.state import create_train_state, make_optimizer

    cfg = _cfg(scene_dir, accum_iter=2, optimizer="SGD", learning_rate=0.1,
               rotate_aug=False, scale_aug=False, color_aug=False,
               shuffle_index=False)
    ds = ScanNetDataset(cfg, "training", seed=0)
    loader = PackedLoader(ds, 2, level_caps=[1024, 512, 256], seed=0)
    batch = next(iter(loader))

    model = PointConvFormer_Segmentation(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch.feats, list(batch.points),
        list(batch.edges_self), list(batch.edges_forward),
        list(batch.edges_propagate), list(batch.norms),
        masks=list(batch.masks), train=False)
    tx, _ = make_optimizer(cfg, iter_per_epoch=10)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg)

    p0 = jax.tree_util.tree_leaves(state.params)[0]
    state1, _ = step(state, batch, jax.random.PRNGKey(1))
    # first accumulation step: parameters must NOT move
    assert np.allclose(np.asarray(jax.tree_util.tree_leaves(state1.params)[0]),
                       np.asarray(p0))
    state2, _ = step(state1, batch, jax.random.PRNGKey(2))
    # second step: parameters move
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]),
        np.asarray(p0))


def test_trainer_main_single_device(scene_dir, tmp_path):
    """The trainer CLI entry end-to-end: epoch loop, eval cadence, checkpoint
    save + resume, metrics.jsonl — on one (CPU) device."""
    from pcf_tpu.train import trainer

    cfg = _cfg(scene_dir, total_epoches=1, data_parallel=1,
               experiment_dir=str(tmp_path / "exp"), NUM_WORKERS=0,
               eval_freq=1, save_freq=1, warmup_epochs=1)
    trainer.main(cfg.copy())
    metrics = (tmp_path / "exp" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) >= 1
    assert (tmp_path / "exp" / "model").exists()

    # resume: epoch 0 checkpoint exists, run to epoch 2
    cfg2 = cfg.copy()
    cfg2.total_epoches = 2
    trainer.main(cfg2)
    log = (tmp_path / "exp" / "log.txt").read_text()
    assert "resumed from epoch 1" in log


def test_trainer_main_mesh(scene_dir, tmp_path):
    """Trainer main() under a 2-device mesh: pinned caps kick in, batches
    stack, psum metrics flow, validation covers the odd batch count."""
    from pcf_tpu.train import trainer

    cfg = _cfg(scene_dir, total_epoches=1, data_parallel=2, BATCH_SIZE=1,
               experiment_dir=str(tmp_path / "exp2"), eval_freq=1,
               save_freq=1, warmup_epochs=1, level_caps_sample=3)
    trainer.main(cfg.copy())
    log = (tmp_path / "exp2" / "log.txt").read_text()
    assert "Val result" in log


def test_getdataLoadersDDP(scene_dir, monkeypatch):
    from pcf_tpu.data import scannet

    cfg = _cfg(scene_dir)
    train_loader, val_loader = scannet.getdataLoadersDDP(cfg)
    assert train_loader.process_count >= 1
    assert len(list(val_loader)) >= 1


def test_pth_scene_loading(tmp_path):
    """The torch-serialized .pth branch of load_scene_file: the exact tuple
    layout the reference's prepare_data.py writes (coords, feats[color+normal],
    labels, scene_name) must flow through the dataset to a packed batch."""
    import torch

    from pcf_tpu.data.scannet import ScanNetDataset, load_scene_file

    coord, norm, feats, labels = synthetic_scene(500, extent=4.0,
                                                 num_classes=NCLS, seed=7)
    full_feats = np.concatenate([feats, norm], axis=1)
    os.makedirs(tmp_path / "train", exist_ok=True)
    for i in range(2):
        torch.save((coord, full_feats, labels.astype(np.int64), f"scene{i}"),
                   tmp_path / "train" / f"scene{i}.pth")

    c, color, n, lab, name = load_scene_file(str(tmp_path / "train" / "scene0.pth"))
    np.testing.assert_allclose(c, coord)
    np.testing.assert_allclose(color, feats)
    np.testing.assert_allclose(n, norm)
    np.testing.assert_array_equal(lab, labels)
    assert name == "scene0"

    cfg = _cfg(tmp_path, train_data_path=str(tmp_path / "train" / "*.pth"),
               val_data_path=str(tmp_path / "train" / "*.pth"),
               test_data_path=str(tmp_path / "train" / "*.pth"))
    ds = ScanNetDataset(cfg, "training", seed=0)
    assert len(ds) == 2
    item = ds[0]
    assert len(item["point_list"]) == 3
    assert item["feature_list"].shape[1] == 3


def test_loader_windowed_edges(scene_dir):
    """cfg.window_gather=True: the loader Morton-sorts scenes and emits
    WindowedEdges for every edge array; indices match the plain arrays'
    gather results by construction (ops/window.py invariants)."""
    from pcf_tpu.data.scannet import PackedLoader, ScanNetDataset
    from pcf_tpu.ops.window import WindowedEdges

    cfg = _cfg(scene_dir, window_gather=True, window_tile=128)
    ds = ScanNetDataset(cfg, "training", seed=0)
    loader = PackedLoader(ds, batch_size=2, bucket_multiple=256, seed=0)
    b = next(iter(loader))
    for arrs in (b.edges_self, b.edges_forward, b.edges_propagate):
        for e in arrs:
            assert isinstance(e, WindowedEdges)
            T, Wsz = e.window_rows.shape
            assert e.nei.shape[0] == T * e.tile
            # every edge resolves to its own row through the window
            rows = np.asarray(e.window_rows)[
                np.repeat(np.arange(T), e.tile * e.nei.shape[1]),
                np.asarray(e.localT).reshape(-1)]
            assert np.array_equal(rows, np.asarray(e.nei).reshape(-1))


def test_window_overflow_policies(scene_dir):
    """An adversarial scene whose tile unique-neighbor count blows the pinned
    window size must DEGRADE, not kill the run (VERDICT r1 #5): policy
    'plain' re-packs the affected batch with plain edges, 'drop' removes the
    offending scene and keeps the WindowedEdges structure (mesh-safe),
    'raise' preserves the strict behavior."""
    import warnings as warnings_mod

    import jax.numpy as jnp

    from pcf_tpu.data.scannet import PackedLoader, ScanNetDataset
    from pcf_tpu.ops.window import WindowedEdges, WindowOverflow

    class Adversarial(ScanNetDataset):
        """Scene 0's level-0 self edges get row-scrambled: tiles then touch
        ~tile*K unique neighbors, guaranteeing a window overflow."""

        def __getitem__(self, idx):
            item = super().__getitem__(idx)
            if idx == 0:
                rng = np.random.default_rng(0)
                es = [e.copy() for e in item["nei_self_list"]]
                es[0] = es[0][rng.permutation(es[0].shape[0])]
                item["nei_self_list"] = es
            return item

    def make_loader(policy):
        cfg = _cfg(scene_dir, window_gather=True, window_tile=128,
                   window_sizes=(256, 1536, 512), window_overflow=policy,
                   shuffle_index=False, rotate_aug=False, scale_aug=False,
                   color_aug=False)
        ds = Adversarial(cfg, "training", seed=0)
        return PackedLoader(ds, batch_size=2, bucket_multiple=256,
                            shuffle=False, drop_last=False, seed=0)

    # sanity: strict mode raises (the round-1 behavior)
    with pytest.raises(WindowOverflow):
        with warnings_mod.catch_warnings():
            warnings_mod.simplefilter("ignore")
            list(make_loader("raise"))

    # 'plain': every batch survives; the affected batch degrades to plain
    # edges, the clean batch keeps its windows
    with pytest.warns(UserWarning, match="window overflow"):
        batches = list(make_loader("plain"))
    assert len(batches) == 2
    assert isinstance(batches[0].edges_self[0], jnp.ndarray)  # fell back
    assert isinstance(batches[1].edges_self[0], WindowedEdges)

    # 'drop': the offending scene is removed, structure stays windowed
    with pytest.warns(UserWarning, match="window overflow"):
        batches = list(make_loader("drop"))
    assert len(batches) == 2
    for b in batches:
        assert isinstance(b.edges_self[0], WindowedEdges)
    # scene 0 was dropped: batch 0 now holds only scene 1's points
    n_valid = int(np.asarray(batches[0].masks[0]).sum())
    ds_clean = ScanNetDataset(
        _cfg(scene_dir, window_gather=True, shuffle_index=False,
             rotate_aug=False, scale_aug=False, color_aug=False),
        "training", seed=0)
    assert n_valid == ds_clean[1]["point_list"][0].shape[0]


def test_parallel_workers_match_single(scene_dir):
    """NUM_WORKERS>1 (thread-pool scene fetching, the torch DataLoader
    workers analog) must yield identical batches to the single-producer
    path when augmentation is off (validation config)."""
    import jax

    from pcf_tpu.data.scannet import PackedLoader, ScanNetDataset

    cfg = _cfg(scene_dir)
    batches = {}
    for workers in (0, 3):
        ds = ScanNetDataset(cfg, "validation", seed=0)
        loader = PackedLoader(ds, 1, bucket_multiple=256, shuffle=False,
                              drop_last=False, num_workers=workers)
        batches[workers] = list(loader)
    assert len(batches[0]) == len(batches[3]) == 3
    for a, b in zip(batches[0], batches[3]):
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
