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


def _make_texture(rng: np.random.Generator, size: int = 1024, n_rect: int = 900,
                  micro: bool = False) -> np.ndarray:
    """High-contrast texture with plenty of FAST corners: random rectangles
    over filtered noise, lightly smoothed.

    micro=True adds per-rectangle shading gradients + per-pixel noise so
    every corner's 31 px descriptor patch is unique (real-surface
    statistics). Round-5 finding (NOTES): the flat rectangles make
    repeated corners produce near-identical rBRIEF descriptors under the
    bit-exact blur path, and the 0.75 searchByBoW ratio test then rejects
    almost all matches between genuine view pairs (n_bow 10 where Sim3
    projection verified 367). The micro variant raises the e2e revisit's
    brute-force ratio-test matches 10 -> 101 — but wholesale switching
    the default destabilized the orbit bench (ATE 1.4 m), so it stays
    opt-in until the round-6 retrieval retuning."""
    tex = rng.uniform(80, 150, size=(size, size)).astype(np.float32)
    for _ in range(n_rect):
        x, y = rng.integers(0, size - 40, size=2)
        w, h = rng.integers(6, 40, size=2)
        val = rng.uniform(0, 255)
        if micro:
            gx, gy = rng.uniform(-3.0, 3.0, size=2)
            yy, xx = np.mgrid[0:h, 0:w]
            tex[y : y + h, x : x + w] = (
                val + gx * xx + gy * yy + rng.uniform(-9.0, 9.0, (h, w)))
        else:
            tex[y : y + h, x : x + w] = val
    # small blur to avoid aliasing: box filter 2x2
    tex = 0.25 * (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1) + np.roll(tex, (1, 1), (0, 1)))
    return np.clip(tex, 0, 255)


def room_orbit_trajectory(
    n_frames: int,
    radius: float = 1.2,
    loops: float = 1.0,
    bob: float = 0.08,
    wobble: float = 0.15,
    dwell: float = 0.0,
    dwell_angle: float = 0.06,
) -> np.ndarray:
    """Camera orbit inside the "room" scene: position on a circle of the
    given radius in the x-z plane, looking radially OUTWARD at the walls.

    New wall area enters the frustum every frame (sustained keyframe
    creation — the fr1_room duty cycle, reference vo_run.cpp:105-137), and
    after `loops` full turns the camera revisits its exact start view (loop
    closure opportunity). `bob` adds vertical motion and `wobble` radial
    motion so triangulation has baseline beyond pure rotation.

    `dwell` > 0 spends that fraction of the frames slowly covering only the
    first `dwell_angle` fraction of the sweep before the full-rate orbit —
    the fr1_room structure: the loop-closure target region is observed by
    many tightly-covisible early keyframes (so its map points accumulate
    observers and survive), then the fast sweep sustains KF density, and
    the revisit returns to the well-established region.

    Returns (N,4,4) T_w_c, suitable for SyntheticRGBD(trajectory=...).
    """
    ts_lin = np.arange(n_frames, dtype=np.float64) / max(n_frames - 1, 1)
    if dwell > 0:
        ts = np.where(
            ts_lin < dwell,
            ts_lin / dwell * dwell_angle,
            dwell_angle
            + (ts_lin - dwell) / (1.0 - dwell) * (1.0 - dwell_angle),
        )
    else:
        ts = ts_lin
    poses = np.zeros((n_frames, 4, 4), dtype=np.float32)
    for i, t in enumerate(ts):
        th = 2.0 * np.pi * loops * t
        # wobble/bob follow UNWARPED time: during a dwell the camera still
        # translates (triangulation baseline), it just stops sweeping
        th_lin = 2.0 * np.pi * loops * ts_lin[i]
        r = radius + wobble * np.sin(3.1 * th_lin)
        y = bob * np.sin(2.3 * th_lin)
        p = np.array([r * np.sin(th), y, r * np.cos(th)])
        # camera z = outward radial, y = world y (down), x = y cross z
        zc = np.array([np.sin(th), 0.0, np.cos(th)])
        yc = np.array([0.0, 1.0, 0.0])
        xc = np.cross(yc, zc)
        T = np.eye(4, dtype=np.float32)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = xc, yc, zc, p
        poses[i] = T
    return poses


def pan_return_trajectory(
    n_frames: int,
    recede: float = 2.6,
    yaw_max: float = 1.7,
    z0: float = 1.6,
) -> np.ndarray:
    """Recede-pan-return inside the "room" scene (the scaled-up shape of
    tests/test_loop_e2e.pan_trajectory, whose closure behavior is pinned
    by the slow suite): start near one wall looking at it, RECEDE so the
    start view stays in frustum while new peripheral area sustains
    keyframe creation, pan fully onto the adjacent wall (the start view
    leaves the frustum entirely), pan back, and keep receding over the
    old wall. The revisit therefore returns to a region observed by MANY
    keyframes over a long baseline — the property loop-closure candidate
    matching (searchByBoW >=20) actually needs, and the structural reason
    fr1_room closes for the reference.

    Returns (N,4,4) T_w_c.
    """
    n_settle = int(0.25 * n_frames)
    n_out = int(0.25 * n_frames)
    n_hold = int(0.06 * n_frames)
    n_back = int(0.25 * n_frames)
    n_home = n_frames - n_settle - n_out - n_hold - n_back
    dz = recede / (n_settle + n_home)

    def pose(i, yaw, z, tx=0.0, ty=0.0):
        c, s = np.cos(yaw), np.sin(yaw)
        T = np.eye(4, dtype=np.float32)
        # camera looks along +z rotated by yaw about y
        T[:3, 0] = np.array([c, 0.0, -s])
        T[:3, 1] = np.array([0.0, 1.0, 0.0])
        T[:3, 2] = np.array([s, 0.0, c])
        T[:3, 3] = np.array([tx, ty, z])
        return T

    poses = []
    z = z0
    k = 0
    for i in range(n_settle):
        z -= dz
        poses.append(pose(k, 0.06 * np.sin(1.1 * i), z,
                          tx=0.10 * np.sin(0.8 * i), ty=0.08 * np.sin(1.3 * i)))
        k += 1
    for i in range(n_out):
        y = yaw_max * (i + 1) / n_out
        poses.append(pose(k, y, z, tx=0.05 * np.sin(3.0 * y)))
        k += 1
    for i in range(n_hold):
        poses.append(pose(k, yaw_max, z, tx=0.05 * np.sin(3.0 * yaw_max),
                          ty=0.03 * np.sin(0.9 * i)))
        k += 1
    for i in range(n_back):
        y = yaw_max * (1.0 - (i + 1) / n_back)
        poses.append(pose(k, y, z, tx=0.05 * np.sin(3.0 * y)))
        k += 1
    for i in range(n_home):
        z -= dz
        poses.append(pose(k, 0.05 * np.sin(1.3 * i), z,
                          tx=0.10 * np.sin(0.9 * i + 2.0), ty=0.08 * np.sin(1.1 * i)))
        k += 1
    return np.stack(poses)


@dataclasses.dataclass
class SyntheticRGBD:
    """Renders frames along a smooth trajectory inside a textured scene.

    scene="corner" (default): box corner — back wall z=3.0, floor y=0.8,
    right wall x=1.5. Camera starts at origin looking down +z.

    scene="room": a closed 6-plane room (4 walls + floor + ceiling, each
    with its own texture) centered on the origin — built for long orbiting
    trajectories that sustain keyframe creation (new wall area enters the
    frustum every frame) and revisit the exact start view, the fr1_room
    duty cycle (SURVEY §6; vo_run.cpp:105-137).

    texture_corners scales the number of high-contrast rectangles per
    texture: 1.0 is the nominal regime; ~0.03 gives a texture-poor scene
    (the fr3_nstr_tex_near analogue, README.md:19-26).

    moving_patch, when set, is a (size_m, speed_m_per_frame) tuple: a
    textured square on the back wall (z = back plane) that slides
    laterally by speed every frame — an independently moving object whose
    features violate the static-world model (the fr3_sit_halfsph dynamic-
    scene analogue); its depth is rendered slightly in front of the wall.
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
    scene: str = "corner"
    texture_corners: float = 1.0
    moving_patch: Tuple[float, float] = None

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        n_rect = max(int(900 * self.texture_corners), 0)
        if self.scene == "corner":
            self.tex_wall = _make_texture(rng, n_rect=n_rect)
            self.tex_floor = _make_texture(rng, n_rect=n_rect)
            self.tex_side = _make_texture(rng, n_rect=n_rect)
            # (axis, plane value, texture, texture uv axes)
            self.planes = [
                (2, 3.0, self.tex_wall, (0, 1)),   # back wall z = 3
                (1, 0.8, self.tex_floor, (0, 2)),  # floor y = 0.8
                (0, 1.5, self.tex_side, (1, 2)),   # right wall x = 1.5
            ]
            # walls don't extend infinitely: clip hits to the box corner
            self.bounds = ((-3.0, 1.5 + 1e-3), (-3.0, 0.8 + 1e-3), (-1.0, 3.0 + 1e-3))
        elif self.scene == "room":
            texs = [_make_texture(rng, n_rect=n_rect) for _ in range(6)]
            hx, hz = 3.0, 3.0          # half extents of the room footprint
            y_floor, y_ceil = 1.0, -1.5  # camera y axis points down
            self.planes = [
                (2, hz, texs[0], (0, 1)),      # far wall
                (2, -hz, texs[1], (0, 1)),     # near wall
                (0, hx, texs[2], (1, 2)),      # right wall
                (0, -hx, texs[3], (1, 2)),     # left wall
                (1, y_floor, texs[4], (0, 2)),  # floor
                (1, y_ceil, texs[5], (0, 2)),   # ceiling
            ]
            e = 1e-3
            self.bounds = ((-hx - e, hx + e), (y_ceil - e, y_floor + e), (-hz - e, hz + e))
        else:
            raise ValueError(f"unknown scene {self.scene!r}")
        if self.moving_patch is not None:
            self.tex_patch = _make_texture(rng, size=256, n_rect=max(n_rect // 8, 40))
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

        (bx0, bx1), (by0, by1), (bz0, bz1) = self.bounds
        for axis, value, tex, uv_axes in self.planes:
            denom = d_w[..., axis]
            denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
            lam = (value - o_w[axis]) / denom  # ray parameter
            pt = o_w[None, None, :] + lam[..., None] * d_w  # world hit point
            z_cam = lam * d_cam[..., 2]  # camera-frame depth (d_cam z == 1)
            valid = (lam > 0.05) & (z_cam < depth)
            # inside scene bounds (so walls don't extend infinitely)
            in_box = (
                (pt[..., 0] > bx0) & (pt[..., 0] < bx1)
                & (pt[..., 1] > by0) & (pt[..., 1] < by1)
                & (pt[..., 2] > bz0) & (pt[..., 2] < bz1)
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

        if self.moving_patch is not None:
            # Independently moving object: a textured square hovering 5 cm in
            # front of the first plane, sliding along its first uv axis every
            # frame. Its features are rendered with CONSISTENT depth (the ray
            # hit), so tracking sees geometrically plausible but world-frame
            # inconsistent landmarks — the dynamic-scene failure mode
            # (fr3_sit_halfsph analogue, reference README.md:19-26).
            size_m, speed = self.moving_patch
            axis, value, _, (a, b) = self.planes[0]
            sign = 1.0 if value > 0 else -1.0
            pv = value - sign * 0.05
            denom = d_w[..., axis]
            denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
            lam = (pv - o_w[axis]) / denom
            pt = o_w[None, None, :] + lam[..., None] * d_w
            z_cam = lam * d_cam[..., 2]
            ca = -1.0 + speed * i  # patch center slides along uv axis a
            cb = -0.3
            half = 0.5 * size_m
            hit = (
                (lam > 0.05) & (z_cam < depth)
                & (np.abs(pt[..., a] - ca) < half) & (np.abs(pt[..., b] - cb) < half)
            )
            tex = self.tex_patch
            ts_ = tex.shape[0]
            tu = (pt[..., a] - (ca - half)) / size_m * (ts_ - 2)
            tv = (pt[..., b] - (cb - half)) / size_m * (ts_ - 2)
            x0 = np.clip(np.floor(tu).astype(np.int64), 0, ts_ - 2)
            y0 = np.clip(np.floor(tv).astype(np.int64), 0, ts_ - 2)
            wx = np.clip(tu - x0, 0, 1)
            wy = np.clip(tv - y0, 0, 1)
            val = (
                tex[y0, x0] * (1 - wx) * (1 - wy)
                + tex[y0, x0 + 1] * wx * (1 - wy)
                + tex[y0 + 1, x0] * (1 - wx) * wy
                + tex[y0 + 1, x0 + 1] * wx * wy
            )
            gray = np.where(hit, val, gray)
            depth = np.where(hit, z_cam, depth)

        depth = np.where(depth >= big, 0.0, depth)  # 0 = no depth (TUM sentinel)
        return gray.astype(np.uint8), depth, float(i) / 30.0

    def __len__(self) -> int:
        return self.n_frames

    def __getitem__(self, i: int):
        return self.render(i)

    def gt_T_c_w(self, i: int) -> np.ndarray:
        return np.linalg.inv(self.poses[i])
