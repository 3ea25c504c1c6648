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
