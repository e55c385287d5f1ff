"""TUM RGB-D dataset I/O.

Covers the reference driver's dataset handling (reference: test/vo_run.cpp:28-58
— associate.txt parsing; :105-123 — image loading; :161-232 — TUM-format
trajectory export). Image decode uses cv2/imageio on the host; all compute
stays on device.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class AssociatedFrame:
    rgb_time: str
    rgb_path: str
    depth_time: str
    depth_path: str


def read_associate(dataset_dir: str, limit: int = 0) -> List[AssociatedFrame]:
    """Parse associate.txt: lines of ``t_rgb rgb_path t_depth depth_path``.

    ``limit`` mirrors the reference's ``data_num`` loop bound (vo_run.cpp:42-57);
    0 means all lines.
    """
    path = os.path.join(dataset_dir, "associate.txt")
    frames: List[AssociatedFrame] = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 4:
                continue
            frames.append(
                AssociatedFrame(
                    rgb_time=parts[0],
                    rgb_path=os.path.join(dataset_dir, parts[1]),
                    depth_time=parts[2],
                    depth_path=os.path.join(dataset_dir, parts[3]),
                )
            )
            if limit and len(frames) >= limit:
                break
    return frames


def _imread_gray(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(path)
        return img
    except ImportError:
        import imageio.v3 as iio

        img = iio.imread(path)
        if img.ndim == 3:
            # ITU-R BT.601 luma, matching cv2.cvtColor RGB2GRAY
            img = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]).astype(np.uint8)
        return img


def _imread_depth(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise IOError(path)
        return img
    except ImportError:
        import imageio.v3 as iio

        return iio.imread(path)


class TumDataset:
    """Iterates (gray u8 HxW, depth f32 HxW in meters, timestamp) triples.

    Sequential access uses the native C++ prefetching decoder
    (native/dataloader.cpp) when it builds; random access or a missing
    toolchain falls back to cv2/imageio on the Python thread.
    """

    def __init__(
        self,
        dataset_dir: str,
        depth_scale: float = 5000.0,
        limit: int = 0,
        use_native: bool = True,
        width: int = 640,
        height: int = 480,
    ):
        self.dataset_dir = dataset_dir
        self.depth_scale = depth_scale
        self.frames = read_associate(dataset_dir, limit=limit)
        self._native = None
        if use_native and self.frames:
            try:
                from ..native import NativeTumLoader, native_available

                if native_available():
                    self._native = NativeTumLoader(
                        [f.rgb_path for f in self.frames],
                        [f.depth_path for f in self.frames],
                        [float(f.rgb_time) for f in self.frames],
                        depth_scale=depth_scale, width=width, height=height,
                    )
            except Exception:
                self._native = None

    def __len__(self) -> int:
        return len(self.frames)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray, float]:
        if self._native is not None:
            try:
                return self._native[i]
            except ValueError:
                pass  # non-sequential access: fall back
        fr = self.frames[i]
        gray = _imread_gray(fr.rgb_path)
        depth_raw = _imread_depth(fr.depth_path).astype(np.float32)
        depth = depth_raw / self.depth_scale  # visualOdometry.cpp:162-166
        return gray, depth, float(fr.rgb_time)


def write_trajectory_tum(
    path: str,
    timestamps: List[float],
    T_w_c: np.ndarray,
) -> None:
    """Write TUM trajectory: ``t tx ty tz qx qy qz qw`` per row.

    ``T_w_c``: (N, 4, 4) camera-to-world poses (the reference stores T_c_w and
    inverts at export time, vo_run.cpp:178,231).
    """
    from .. import lie
    import jax.numpy as jnp

    T = jnp.asarray(T_w_c, dtype=jnp.float32)
    quat = np.asarray(lie.mat_to_quat(T[:, :3, :3]))
    trans = np.asarray(T[:, :3, 3])
    with open(path, "w") as f:
        for i, t in enumerate(timestamps):
            tx, ty, tz = trans[i]
            qx, qy, qz, qw = quat[i]
            f.write(f"{t:.6f} {tx:.7f} {ty:.7f} {tz:.7f} {qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}\n")


def ate_rmse(gt_times, gt_T_w_c, est_times, est_T_w_c, max_dt: float = 0.02) -> float:
    """Absolute trajectory error RMSE after SE3 (Horn) alignment.

    Equivalent of the TUM benchmark ``evaluate_ate.py`` the reference relies
    on externally (SURVEY.md §4).
    """
    gt_times = np.asarray(gt_times)
    est_times = np.asarray(est_times)
    gt_xyz, est_xyz = [], []
    j = 0
    for i, t in enumerate(est_times):
        j = int(np.argmin(np.abs(gt_times - t)))
        if abs(gt_times[j] - t) <= max_dt:
            gt_xyz.append(gt_T_w_c[j][:3, 3])
            est_xyz.append(est_T_w_c[i][:3, 3])
    if len(gt_xyz) < 3:
        return float("nan")
    X = np.stack(est_xyz).T  # 3xN (model)
    Y = np.stack(gt_xyz).T  # 3xN (data)
    mx, my = X.mean(1, keepdims=True), Y.mean(1, keepdims=True)
    Xc, Yc = X - mx, Y - my
    U, _, Vt = np.linalg.svd(Yc @ Xc.T)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    t = my - R @ mx
    err = R @ X + t - Y
    return float(np.sqrt((err**2).sum(0).mean()))
