"""Synthetic RGB-D sequence generator.

The reference is verified only against TUM downloads (SURVEY.md §4). The TPU
build adds a deterministic synthetic renderer so every pipeline stage has
hermetic tests and benchmarks that run with zero network egress: a textured
box corner (back wall + floor + side wall) ray-cast through the pinhole
model, with exact ground-truth poses and depth.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


def _make_texture(rng: np.random.Generator, size: int = 1024) -> np.ndarray:
    """High-contrast texture with plenty of FAST corners: random rectangles
    over filtered noise, lightly smoothed."""
    tex = rng.uniform(80, 150, size=(size, size)).astype(np.float32)
    for _ in range(900):
        x, y = rng.integers(0, size - 40, size=2)
        w, h = rng.integers(6, 40, size=2)
        val = rng.uniform(0, 255)
        tex[y : y + h, x : x + w] = val
    # small blur to avoid aliasing: box filter 2x2
    tex = 0.25 * (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1) + np.roll(tex, (1, 1), (0, 1)))
    return np.clip(tex, 0, 255)


@dataclasses.dataclass
class SyntheticRGBD:
    """Renders frames along a smooth trajectory inside a textured box corner.

    World geometry (meters): back wall z=3.0, floor y=0.8, right wall x=1.5.
    Camera starts at origin looking down +z.
    """

    width: int = 640
    height: int = 480
    fx: float = 517.3
    fy: float = 516.5
    cx: float = 318.6
    cy: float = 255.3
    n_frames: int = 30
    seed: int = 0
    motion_scale: float = 1.0
    trajectory: np.ndarray = None  # optional [N,4,4] T_w_c override

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        self.tex_wall = _make_texture(rng)
        self.tex_floor = _make_texture(rng)
        self.tex_side = _make_texture(rng)
        if self.trajectory is not None:
            self.poses = np.asarray(self.trajectory, np.float32)
            self.n_frames = self.poses.shape[0]
        else:
            self.poses = self._trajectory()  # list of T_w_c (4x4)

    # -- ground truth trajectory -------------------------------------------

    def _trajectory(self) -> np.ndarray:
        """Smooth sinusoidal translation + small yaw/pitch. Returns (N,4,4) T_w_c."""
        from .. import lie
        import jax.numpy as jnp

        ts = np.arange(self.n_frames, dtype=np.float64) / max(self.n_frames - 1, 1)
        poses = []
        for t in ts:
            s = self.motion_scale
            tx = 0.25 * s * np.sin(2 * np.pi * t)
            ty = 0.10 * s * np.sin(4 * np.pi * t + 1.0)
            tz = 0.15 * s * (1 - np.cos(2 * np.pi * t))
            yaw = 0.10 * s * np.sin(2 * np.pi * t + 0.5)
            pitch = 0.05 * s * np.sin(2 * np.pi * t + 2.0)
            xi = np.array([tx, ty, tz, pitch, yaw, 0.0], dtype=np.float32)
            T = np.asarray(lie.se3_exp(jnp.asarray(xi)))
            poses.append(T)
        return np.stack(poses)

    # -- rendering -----------------------------------------------------------

    def render(self, i: int) -> Tuple[np.ndarray, np.ndarray, float]:
        """Returns (gray u8 HxW, depth f32 HxW meters, timestamp)."""
        T_w_c = self.poses[i]
        R, t = T_w_c[:3, :3], T_w_c[:3, 3]
        H, W = self.height, self.width
        u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
        # camera rays in world frame
        d_cam = np.stack([(u - self.cx) / self.fx, (v - self.cy) / self.fy, np.ones_like(u)], axis=-1)
        d_w = d_cam @ R.T  # (H, W, 3)
        o_w = t  # (3,)

        big = 1e9
        depth = np.full((H, W), big, dtype=np.float32)
        gray = np.zeros((H, W), dtype=np.float32)

        planes = [
            # (axis, value, positive side?, texture, uv axes)
            (2, 3.0, self.tex_wall, (0, 1)),   # back wall z = 3
            (1, 0.8, self.tex_floor, (0, 2)),  # floor y = 0.8
            (0, 1.5, self.tex_side, (1, 2)),   # right wall x = 1.5
        ]
        for axis, value, tex, uv_axes in planes:
            denom = d_w[..., axis]
            denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
            lam = (value - o_w[axis]) / denom  # ray parameter
            pt = o_w[None, None, :] + lam[..., None] * d_w  # world hit point
            z_cam = lam * d_cam[..., 2]  # camera-frame depth (d_cam z == 1)
            valid = (lam > 0.05) & (z_cam < depth)
            # inside box bounds (so walls don't extend infinitely)
            in_box = (
                (pt[..., 0] > -3.0) & (pt[..., 0] < 1.5 + 1e-3)
                & (pt[..., 1] > -3.0) & (pt[..., 1] < 0.8 + 1e-3)
                & (pt[..., 2] > -1.0) & (pt[..., 2] < 3.0 + 1e-3)
            )
            valid &= in_box
            a, b = uv_axes
            tex_size = tex.shape[0]
            tu = (pt[..., a] * 170.0) % tex_size
            tv = (pt[..., b] * 170.0) % tex_size
            # bilinear sample
            x0 = np.floor(tu).astype(np.int64) % tex_size
            y0 = np.floor(tv).astype(np.int64) % tex_size
            x1 = (x0 + 1) % tex_size
            y1 = (y0 + 1) % tex_size
            wx = tu - np.floor(tu)
            wy = tv - np.floor(tv)
            val = (
                tex[y0, x0] * (1 - wx) * (1 - wy)
                + tex[y0, x1] * wx * (1 - wy)
                + tex[y1, x0] * (1 - wx) * wy
                + tex[y1, x1] * wx * wy
            )
            gray = np.where(valid, val, gray)
            depth = np.where(valid, z_cam, depth)

        depth = np.where(depth >= big, 0.0, depth)  # 0 = no depth (TUM sentinel)
        return gray.astype(np.uint8), depth, float(i) / 30.0

    def __len__(self) -> int:
        return self.n_frames

    def __getitem__(self, i: int):
        return self.render(i)

    def gt_T_c_w(self, i: int) -> np.ndarray:
        return np.linalg.inv(self.poses[i])
