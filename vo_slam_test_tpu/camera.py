"""Pinhole RGB-D camera model with virtual-stereo depth.

Mirrors the reference Camera class (reference: camera.h:12-49,
camera.cpp:8-100) but as a JAX pytree of scalars with *batched* transforms:
every op accepts (..., 2) pixels / (..., 3) points so the tracking and
mapping pipelines can run over thousands of features in one fused program.

Grid constants: FRAME_GRID_COLS=64, FRAME_GRID_ROWS=48 (camera.h:8-9). The
TPU build keeps these for keyframe-decision parity, but data association
uses dense masked distance matrices instead of a grid lookup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from . import lie
from .config import SlamConfig

FRAME_GRID_COLS = 64
FRAME_GRID_ROWS = 48


@struct.dataclass
class Camera:
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    bf: jnp.ndarray          # baseline * fx (virtual stereo, camera.cpp:19)
    b: jnp.ndarray           # baseline = bf / fx
    th_depth: jnp.ndarray    # close/far threshold, already scaled by b (camera.cpp:20)
    depth_scale: jnp.ndarray
    dist_coef: jnp.ndarray   # (k1, k2, p1, p2, k3)
    width: int = struct.field(pytree_node=False, default=640)
    height: int = struct.field(pytree_node=False, default=480)
    fps: int = struct.field(pytree_node=False, default=30)

    @classmethod
    def from_config(cls, cfg: SlamConfig) -> "Camera":
        b = cfg.camera_bf / cfg.camera_fx
        return cls(
            fx=jnp.float32(cfg.camera_fx),
            fy=jnp.float32(cfg.camera_fy),
            cx=jnp.float32(cfg.camera_cx),
            cy=jnp.float32(cfg.camera_cy),
            bf=jnp.float32(cfg.camera_bf),
            b=jnp.float32(b),
            th_depth=jnp.float32(cfg.thDepth * b),
            depth_scale=jnp.float32(cfg.camera_depthScale),
            dist_coef=jnp.array(
                [cfg.camera_k1, cfg.camera_k2, cfg.camera_p1, cfg.camera_p2, cfg.camera_k3],
                dtype=jnp.float32,
            ),
            width=cfg.camera_width,
            height=cfg.camera_height,
            fps=cfg.camera_fps,
        )

    # -- intrinsics ---------------------------------------------------------

    @property
    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )

    @property
    def grid_per_pixel_w(self) -> float:
        return FRAME_GRID_COLS / float(self.width)

    @property
    def grid_per_pixel_h(self) -> float:
        return FRAME_GRID_ROWS / float(self.height)

    # -- projections (batched; reference camera.cpp:64-100) -----------------

    def pixel2camera(self, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """(..., 2) pixels + (...,) depth -> (..., 3) camera points."""
        x = (uv[..., 0] - self.cx) * depth / self.fx
        y = (uv[..., 1] - self.cy) * depth / self.fy
        return jnp.stack([x, y, depth], axis=-1)

    def camera2pixel(self, p3d: jnp.ndarray) -> jnp.ndarray:
        """(..., 3) camera points -> (..., 2) pixels."""
        z = p3d[..., 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        u = self.fx * p3d[..., 0] / safe_z + self.cx
        v = self.fy * p3d[..., 1] / safe_z + self.cy
        return jnp.stack([u, v], axis=-1)

    def pixel2world(self, uv: jnp.ndarray, depth: jnp.ndarray, T_c_w: jnp.ndarray) -> jnp.ndarray:
        pc = self.pixel2camera(uv, depth)
        T_w_c = lie.se3_inverse(T_c_w)
        return jnp.einsum("ij,...j->...i", T_w_c[:3, :3], pc) + T_w_c[:3, 3]

    def world2pixel(self, pw: jnp.ndarray, T_c_w: jnp.ndarray) -> jnp.ndarray:
        pc = jnp.einsum("ij,...j->...i", T_c_w[:3, :3], pw) + T_c_w[:3, 3]
        return self.camera2pixel(pc)

    def world2camera(self, pw: jnp.ndarray, T_c_w: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("ij,...j->...i", T_c_w[:3, :3], pw) + T_c_w[:3, 3]

    def in_image(self, uv: jnp.ndarray, border: float = 0.0) -> jnp.ndarray:
        """Boolean mask of pixels inside the image bounds."""
        u, v = uv[..., 0], uv[..., 1]
        return (
            (u >= border)
            & (u < self.width - border)
            & (v >= border)
            & (v < self.height - border)
        )

    def u_right(self, u: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """Virtual right-image coordinate uR = u - bf/d (frame.cpp:108-133).

        Negative depth (missing) yields -1, matching the reference sentinel.
        """
        valid = depth > 0
        safe_d = jnp.where(valid, depth, 1.0)
        return jnp.where(valid, u - self.bf / safe_d, -1.0)
