"""Headless visualization + observability (Drawer equivalent).

The reference Drawer (drawer.cpp) renders a live Pangolin window: map
points, keyframe frusta, covisibility (green) / spanning-tree (red) / loop
(blue) edges, plus an OpenCV HUD. This build is headless-first (SURVEY.md
§2 Pangolin row): the same content renders to matplotlib figures/PNGs, and
per-frame tracking metrics export to CSV for offline analysis — the
structured-observability gap noted in SURVEY.md §5.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class MapSnapshot:
    """Host-side copy of the drawable map content."""

    kf_poses: np.ndarray        # [K,4,4] T_c_w of valid keyframes
    points: np.ndarray          # [P,3] valid map point positions
    covis_edges: np.ndarray     # [E,2] keyframe index pairs (weight>=15)
    tree_edges: np.ndarray      # [E,2] spanning-tree pairs
    loop_edges: np.ndarray      # [E,2]


def snapshot_map(map_state) -> MapSnapshot:
    """Extract a drawable snapshot from a MapState (blocks on device)."""
    kf_valid = np.asarray(map_state.kf_valid)
    kf_ids = np.nonzero(kf_valid)[0]
    remap = {int(k): i for i, k in enumerate(kf_ids)}
    poses = np.asarray(map_state.kf_pose)[kf_ids]
    pts = np.asarray(map_state.pt_pos)[np.asarray(map_state.pt_valid)]

    covis = np.asarray(map_state.covis)
    ce = []
    for a in kf_ids:
        for b in kf_ids:
            if b > a and covis[a, b] >= 15:  # drawer edge threshold (keyframe covisibles)
                ce.append((remap[int(a)], remap[int(b)]))
    parent = np.asarray(map_state.parent)
    te = [
        (remap[int(k)], remap[int(parent[k])])
        for k in kf_ids
        if parent[k] >= 0 and kf_valid[parent[k]]
    ]
    loops = np.asarray(map_state.loop_edges)
    le = [
        (remap[int(a)], remap[int(b)])
        for a in kf_ids for b in kf_ids
        if b > a and loops[a, b]
    ]
    as2 = lambda e: np.asarray(e, np.int64).reshape(-1, 2)
    return MapSnapshot(
        kf_poses=poses, points=pts,
        covis_edges=as2(ce), tree_edges=as2(te), loop_edges=as2(le),
    )


def _centers(poses: np.ndarray) -> np.ndarray:
    """Camera centers from T_c_w poses."""
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    return -np.einsum("kji,kj->ki", R, t)


def plot_map(snap: MapSnapshot, path: str, title: str = "map") -> None:
    """Top-down (x-z) map render with the reference's edge color coding."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    if snap.points.size:
        ax.scatter(snap.points[:, 0], snap.points[:, 2], s=0.5, c="black", alpha=0.3, label="map points")
    c = _centers(snap.kf_poses)
    for (a, b) in snap.covis_edges:
        ax.plot([c[a, 0], c[b, 0]], [c[a, 2], c[b, 2]], c="green", lw=0.5, alpha=0.5)
    for (a, b) in snap.tree_edges:
        ax.plot([c[a, 0], c[b, 0]], [c[a, 2], c[b, 2]], c="red", lw=0.8)
    for (a, b) in snap.loop_edges:
        ax.plot([c[a, 0], c[b, 0]], [c[a, 2], c[b, 2]], c="blue", lw=1.5)
    ax.scatter(c[:, 0], c[:, 2], s=15, c="red", marker="s", label="keyframes")
    ax.set_xlabel("x [m]"); ax.set_ylabel("z [m]")
    ax.set_title(title); ax.axis("equal"); ax.legend(loc="best", fontsize=8)
    fig.tight_layout(); fig.savefig(path, dpi=120); plt.close(fig)


def plot_trajectories(
    path: str,
    est_T_w_c: np.ndarray,
    gt_T_w_c: Optional[np.ndarray] = None,
    title: str = "trajectory",
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    e = est_T_w_c[:, :3, 3]
    ax.plot(e[:, 0], e[:, 2], c="tab:blue", label="estimate")
    if gt_T_w_c is not None:
        g = gt_T_w_c[:, :3, 3]
        ax.plot(g[:, 0], g[:, 2], c="tab:gray", ls="--", label="ground truth")
    ax.set_xlabel("x [m]"); ax.set_ylabel("z [m]")
    ax.set_title(title); ax.axis("equal"); ax.legend()
    fig.tight_layout(); fig.savefig(path, dpi=120); plt.close(fig)


def save_metrics_csv(path: str, timestamps: Sequence[float], stats: Sequence) -> None:
    """Per-frame tracking metrics (features/matches/inliers/state)."""
    with open(path, "w") as f:
        f.write("timestamp,ok,n_features,n_matches,n_inliers\n")
        for t, s in zip(timestamps, stats):
            f.write(f"{t:.6f},{int(s.ok)},{s.n_features},{s.n_matches},{s.n_inliers}\n")
