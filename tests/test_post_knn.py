"""post_knn path: on-device edge construction matches the host pipeline.

Replaces the reference's knn_post_dataloader_utils tests (the pipeline parity
is the important part: SURVEY.md §2.2 'On-device (post-dataloader) kNN')."""

import numpy as np

from pcf_tpu.config import Config, get_default_configs, get_default_training_cfgs
from pcf_tpu.core import pack_scenes
from pcf_tpu.data import synthetic_scene
from pcf_tpu.data.post_knn import prepare
from pcf_tpu.data.pyramid import scene_to_item, subsample

GRID = [0.3, 0.6, 1.2]


def _cfg():
    cfg = get_default_configs(Config(), num_level=3, base_dim=8)
    cfg = get_default_training_cfgs(cfg)
    cfg.update(grid_size=GRID, K_self=[8] * 3, K_forward=[8] * 3,
               K_propagate=[8] * 3, post_knn=True)
    return cfg


def test_post_knn_edges_match_host():
    cfg = _cfg()
    scenes_host, scenes_dev = [], []
    for i in range(2):
        coord, norm, feats, labels = synthetic_scene(300, extent=4.0, seed=i)
        # host path: edges from cKDTree
        scenes_host.append(scene_to_item(coord, norm, feats, labels, GRID,
                                         8, 8, 8, rng=np.random.default_rng(0)))
        # device path: pyramid only
        pl, nl = subsample(coord, norm, GRID)
        scenes_dev.append({
            "point_list": pl, "surface_normal_list": nl,
            "feature_list": feats, "label_list": labels,
        })

    caps = [1024, 512, 256]
    b_host = pack_scenes(scenes_host, level_caps=caps)
    b_dev = prepare(pack_scenes(scenes_dev, level_caps=caps), cfg)

    # pyramids identical
    for l in range(3):
        np.testing.assert_allclose(np.asarray(b_host.points[l]),
                                   np.asarray(b_dev.points[l]), atol=1e-6)

    # edges: compare neighbor DISTANCES, not indices (tie-breaking differs)
    for l in range(3):
        pts = np.asarray(b_host.points[l])
        m = np.asarray(b_host.masks[l])
        for name, eh, ed, ref_pts in [
            ("self", b_host.edges_self[l], b_dev.edges_self[l], pts),
        ]:
            eh, ed = np.asarray(eh)[m], np.asarray(ed)[m]
            q = pts[m]
            dh = np.sort(((q[:, None] - ref_pts[eh]) ** 2).sum(-1), 1)
            dd = np.sort(((q[:, None] - ref_pts[ed]) ** 2).sum(-1), 1)
            np.testing.assert_allclose(dh, dd, atol=1e-4,
                                       err_msg=f"level {l} {name}")
    for l in range(2):
        pts_l = np.asarray(b_host.points[l])
        pts_n = np.asarray(b_host.points[l + 1])
        m_n = np.asarray(b_host.masks[l + 1])
        q = pts_n[m_n]
        eh = np.asarray(b_host.edges_forward[l])[m_n]
        ed = np.asarray(b_dev.edges_forward[l])[m_n]
        dh = np.sort(((q[:, None] - pts_l[eh]) ** 2).sum(-1), 1)
        dd = np.sort(((q[:, None] - pts_l[ed]) ** 2).sum(-1), 1)
        np.testing.assert_allclose(dh, dd, atol=1e-4, err_msg=f"fwd level {l}")

        m_l = np.asarray(b_host.masks[l])
        q = pts_l[m_l]
        eh = np.asarray(b_host.edges_propagate[l])[m_l]
        ed = np.asarray(b_dev.edges_propagate[l])[m_l]
        dh = np.sort(((q[:, None] - pts_n[eh]) ** 2).sum(-1), 1)
        dd = np.sort(((q[:, None] - pts_n[ed]) ** 2).sum(-1), 1)
        np.testing.assert_allclose(dh, dd, atol=1e-4, err_msg=f"prop level {l}")


def test_grid_subsample_fixed_labels_and_bids():
    """Majority-vote labels + per-scene separation via bids match the host
    grid_subsampling run per scene (VERDICT r1 #7)."""
    import jax.numpy as jnp

    from pcf_tpu.data.pyramid import grid_subsampling
    from pcf_tpu.ops.subsample import grid_subsample_fixed

    rng = np.random.default_rng(0)
    scenes = []
    for i in range(2):
        pts = rng.uniform(0, 3, size=(200, 3)).astype(np.float32)
        lab = rng.integers(0, 5, size=200).astype(np.int32)
        scenes.append((pts, lab))

    cap = 512
    pts_all = np.concatenate([p for p, _ in scenes])
    lab_all = np.concatenate([l for _, l in scenes])
    bid_all = np.concatenate([np.full(200, i, np.int32) for i in range(2)])
    pad = cap - pts_all.shape[0]
    pts_pad = np.pad(pts_all, [(0, pad), (0, 0)])
    lab_pad = np.pad(lab_all, [(0, pad)], constant_values=-100)
    bid_pad = np.pad(bid_all, [(0, pad)], constant_values=-1)
    mask = np.arange(cap) < pts_all.shape[0]

    out = grid_subsample_fixed(
        jnp.asarray(pts_pad), jnp.asarray(mask), 0.5, capacity=cap,
        labels=jnp.asarray(lab_pad), num_classes=5,
        bid=jnp.asarray(bid_pad), n_scenes=2)
    assert not bool(out["overflow"])
    m = np.asarray(out["mask"])
    dev_pts = np.asarray(out["points"])[m]
    dev_lab = np.asarray(out["labels"])[m]
    dev_bid = np.asarray(out["bid"])[m]

    n_expected = 0
    for i, (pts, lab) in enumerate(scenes):
        host_p, host_l = grid_subsampling(pts, labels=lab, sampleDl=0.5)
        n_expected += host_p.shape[0]
        sel = dev_bid == i
        assert sel.sum() == host_p.shape[0], f"scene {i} voxel count"
        # match voxels by barycenter, then compare voted labels
        order_d = np.lexsort(dev_pts[sel].T)
        order_h = np.lexsort(host_p.T)
        np.testing.assert_allclose(dev_pts[sel][order_d], host_p[order_h],
                                   atol=1e-4)
        np.testing.assert_array_equal(dev_lab[sel][order_d], host_l[order_h])
    assert m.sum() == n_expected


def test_grid_subsample_fixed_overflow_flag():
    import jax.numpy as jnp

    from pcf_tpu.ops.subsample import grid_subsample_fixed

    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 10, size=(256, 3)).astype(np.float32)
    mask = np.ones(256, bool)
    out = grid_subsample_fixed(jnp.asarray(pts), jnp.asarray(mask), 0.1,
                               capacity=64)
    assert bool(out["overflow"])  # ~256 occupied voxels > 64
    assert int(np.asarray(out["mask"]).sum()) == 64  # clamped, not corrupt


def test_device_pyramid_end_to_end():
    """Fully on-device pipeline (cfg.device_pyramid): host packs level 0 only;
    device builds all levels + edges. Per-scene voxel barycenters must match
    the host pyramid, and the model must run on the result."""
    import jax
    import jax.numpy as jnp

    from pcf_tpu.models import PointConvFormer_Segmentation

    cfg = _cfg()
    cfg.update(device_pyramid=True, BATCH_SIZE=2, knn_method="exact",
               guided_level=0, num_heads=2, resblocks=[0, 1, 1],
               mid_dim=[4, 4, 4], num_classes=20,
               device_level_caps=[1024, 512, 256])
    scenes, host_pyramids = [], []
    for i in range(2):
        coord, norm, feats, labels = synthetic_scene(300, extent=4.0, seed=i)
        scenes.append({
            "point_list": [coord.astype(np.float32)],
            "surface_normal_list": [norm.astype(np.float32)],
            "feature_list": feats.astype(np.float32),
            "label_list": labels.astype(np.int32),
        })
        host_pyramids.append(subsample(coord, norm, GRID)[0])

    batch = prepare(pack_scenes(scenes, level_caps=[1024]), cfg)
    assert batch.num_levels == 3
    for l in range(1, 3):
        m = np.asarray(batch.masks[l])
        pts = np.asarray(batch.points[l])[m]
        bid = np.asarray(batch.bids[l])[m]
        for i in range(2):
            host = host_pyramids[i][l]
            got = pts[bid == i]
            assert got.shape[0] == host.shape[0], f"level {l} scene {i}"
            np.testing.assert_allclose(
                got[np.lexsort(got.T)], host[np.lexsort(host.T)], atol=1e-4)

    model = PointConvFormer_Segmentation(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch.feats, list(batch.points),
        list(batch.edges_self), list(batch.edges_forward),
        list(batch.edges_propagate), list(batch.norms),
        masks=list(batch.masks), train=False)
    logits = model.apply(variables, batch.feats, list(batch.points),
                         list(batch.edges_self), list(batch.edges_forward),
                         list(batch.edges_propagate), list(batch.norms),
                         masks=list(batch.masks), train=False)
    assert logits.shape == (1024, cfg.num_classes)
    assert bool(jnp.all(jnp.isfinite(logits[np.asarray(batch.masks[0])])))
