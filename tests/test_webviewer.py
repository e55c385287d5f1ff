"""Interactive HTML viewer export (viz/webviewer.py) on a hand-built map.

Pure host-side — no jit, runs in the fast tier. The reference analogue is
the Pangolin Drawer (drawer.cpp:55-366); SURVEY.md §2 sanctions a web
viewer as its headless replacement.
"""

import json
import re

import numpy as np

from vo_slam_test_tpu.viz.drawer import MapSnapshot
from vo_slam_test_tpu.viz.webviewer import auto_target, export_html


def _snap(n_kf=4, n_pt=100, seed=0):
    rng = np.random.default_rng(seed)
    poses = np.tile(np.eye(4, dtype=np.float64), (n_kf, 1, 1))
    poses[:, 0, 3] = -0.3 * np.arange(n_kf)  # t of T_c_w: centers at +0.3*i
    pts = rng.uniform(-1, 1, (n_pt, 3))
    return MapSnapshot(
        kf_poses=poses,
        points=pts,
        covis_edges=np.asarray([[0, 1], [1, 2], [2, 3]]),
        tree_edges=np.asarray([[1, 0], [2, 1], [3, 2]]),
        loop_edges=np.asarray([[0, 3]]),
    )


def _embedded_data(path):
    html = open(path).read()
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "DATA blob missing"
    return json.loads(m.group(1)), html


class TestWebViewer:
    def test_export_embeds_everything(self, tmp_path):
        snap = _snap()
        traj_T_w_c = np.tile(np.eye(4), (6, 1, 1))
        traj_T_w_c[:, 2, 3] = 0.1 * np.arange(6)  # camera walks along +z
        out = str(tmp_path / "map.html")
        export_html(snap, out, traj_T_w_c=traj_T_w_c)

        data, html = _embedded_data(out)
        assert len(data["pts"]) == 100 and len(data["kf"]) == 4
        assert data["covis"] == [[0, 1], [1, 2], [2, 3]]
        assert data["loop"] == [[0, 3]]
        assert len(data["traj"]) == 6
        # the embedded trajectory is T_c_w: center (-R^T t) must equal the
        # T_w_c translation the caller supplied
        T5 = np.asarray(data["traj"][5])
        c = -T5[:3, :3].T @ T5[:3, 3]
        np.testing.assert_allclose(c, [0, 0, 0.5], atol=1e-3)
        # self-contained: no external script/style references
        assert "http" not in html.split("</title>")[1]
        assert "<canvas" in html and "DATA.loop" in html

    def test_point_cap_and_local_mask(self, tmp_path):
        snap = _snap(n_pt=500)
        local = np.zeros(500, bool)
        local[:50] = True
        out = str(tmp_path / "cap.html")
        export_html(snap, out, local_mask=local, max_points=200)
        data, _ = _embedded_data(out)
        assert len(data["pts"]) == 200 == len(data["local"])
        assert sum(data["local"]) > 0  # subsample kept some local points

    def test_no_trajectory(self, tmp_path):
        out = str(tmp_path / "notraj.html")
        export_html(_snap(), out)
        data, _ = _embedded_data(out)
        assert data["traj"] == []
        tgt = auto_target(_snap())
        assert tgt.shape == (3,)
