"""ORB feature extraction pipeline: device FAST -> host quadtree -> device
orientation/descriptors.

Structure vs the reference (ORBextractor.cpp:1051-1112):

  stage A (one jit): pyramid canvases (raw + blurred), dense FAST-9 scores,
      3x3 NMS, per-cell two-threshold retry, per-cell top-K compaction.
  host: quad-tree distribution per level over ~2-3k compact candidates
      (frontend/distribute.py) — the only sequential piece.
  stage B (one jit): IC-angle orientation, steered rBRIEF on the blurred
      canvas, coordinate scaling to level 0, undistortion, depth lookup and
      virtual-stereo uRight (frame.cpp:36-133 equivalents).

Everything device-side is fixed-shape: MAX_FEATURES-padded arrays with a
validity mask.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Camera
from ..ops import brief, fast, orientation, undistort
from ..ops.distribute_device import distribute_level
from ..ops.pyramid import Pyramid, PyramidSpec, build_pyramid, interior
from .distribute import distribute_octtree
from .frame import MAX_FEATURES, FrameFeatures


@functools.partial(jax.jit, static_argnames=("spec", "top_k"))
def _stage_a(gray: jnp.ndarray, spec: PyramidSpec, threshold_hi: float, threshold_lo: float, top_k: int):
    pyr = build_pyramid(gray, spec)
    cands = fast.detect_pyramid(interior(pyr.raw, spec), spec, threshold_hi, threshold_lo, top_k)
    return pyr, cands


@functools.partial(jax.jit, static_argnames=("spec",))
def _stage_b(
    pyr: Pyramid,
    spec: PyramidSpec,
    level: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    resp: jnp.ndarray,
    valid: jnp.ndarray,
    depth_img: jnp.ndarray,
    cam: Camera,
) -> FrameFeatures:
    if jax.default_backend() == "tpu" and ys.shape[0] % 8 == 0:
        # fused Pallas orientation+descriptor kernel (bit-exact, ~4x the
        # XLA gather formulation; see ops/orb_pallas.py)
        from ..ops.orb_pallas import orb_angle_desc_pallas

        ang, desc = orb_angle_desc_pallas(pyr.raw, pyr.blur, level, ys, xs)
    else:
        ang = orientation.ic_angle(pyr.raw, level, ys, xs)
        desc = brief.compute_descriptors(pyr.blur, level, ys, xs, ang)

    scales = jnp.asarray(spec.scales)
    s = scales[level]
    uv = jnp.stack([xs.astype(jnp.float32) * s, ys.astype(jnp.float32) * s], axis=-1)

    any_dist = jnp.any(cam.dist_coef != 0.0)
    uv_und = jax.lax.cond(
        any_dist,
        lambda: undistort.undistort_points(uv, cam.fx, cam.fy, cam.cx, cam.cy, cam.dist_coef),
        lambda: uv,
    )

    # depth lookup at rounded raw coords (frame.cpp:116-118)
    H, W = depth_img.shape
    ui = jnp.clip(jnp.rint(uv[:, 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.rint(uv[:, 1]).astype(jnp.int32), 0, H - 1)
    d = depth_img[vi, ui]
    has_d = (d > 0) & valid
    depth = jnp.where(has_d, d, -1.0)
    u_right = jnp.where(has_d, uv_und[:, 0] - cam.bf / jnp.where(has_d, d, 1.0), -1.0)

    z = jnp.float32(0.0)
    return FrameFeatures(
        uv=jnp.where(valid[:, None], uv, z),
        uv_und=jnp.where(valid[:, None], uv_und, z),
        response=jnp.where(valid, resp, z),
        angle=jnp.where(valid, ang, z),
        octave=jnp.where(valid, level, 0),
        depth=depth,
        u_right=u_right,
        desc=jnp.where(valid[:, None], desc, jnp.uint32(0)),
        valid=valid,
    )


@functools.partial(jax.jit, static_argnames=("spec", "budgets", "top_k"))
def extract_fused(
    gray: jnp.ndarray,
    depth_img: jnp.ndarray,
    cam: Camera,
    spec: PyramidSpec,
    budgets: Tuple[int, ...],
    threshold_hi: float = 20.0,
    threshold_lo: float = 7.0,
    top_k: int = 8,
) -> FrameFeatures:
    """Whole ORB front end as ONE device program (no host round trip).

    Uses the on-device quad-tree distribution (ops/distribute_device.py)
    instead of the host quadtree — the structural change that removes the
    per-frame device->host->device sync from the hot path.
    """
    pyr = build_pyramid(gray, spec)
    cands = fast.detect_pyramid(interior(pyr.raw, spec), spec, threshold_hi, threshold_lo, top_k)

    L = spec.n_levels
    M = cands.ys.shape[1] * cands.ys.shape[2]
    ys = cands.ys.reshape(L, M)
    xs = cands.xs.reshape(L, M)
    resp = cands.response.reshape(L, M)
    valid = cands.valid.reshape(L, M)

    b = float(fast.DETECT_BORDER)
    # NOTE: a vmapped distribution over levels was measured 13 ms/frame
    # SLOWER than this per-level loop — batched segment ops lower poorly
    keeps = []
    for lvl in range(L):
        h, w = spec.sizes[lvl]
        n_ini = max(int(round((w - 2 * b) / (h - 2 * b))), 1)
        keeps.append(
            distribute_level(
                xs[lvl], ys[lvl], resp[lvl], valid[lvl],
                (b, w - b, b, h - b), budgets[lvl], n_ini=n_ini,
            )
        )
    keep = jnp.stack(keeps)  # [L, M]

    # compact selected candidates into MAX_FEATURES slots
    flat_keep = keep.reshape(-1)
    flat_ys = ys.reshape(-1)
    flat_xs = xs.reshape(-1)
    flat_resp = resp.reshape(-1)
    flat_lvl = jnp.repeat(jnp.arange(L, dtype=jnp.int32), M)
    pos = jnp.cumsum(flat_keep.astype(jnp.int32)) - 1
    slot = jnp.where(flat_keep & (pos < MAX_FEATURES), pos, MAX_FEATURES)

    def compact(v, fill=0):
        out = jnp.full((MAX_FEATURES + 1,), fill, v.dtype)
        return out.at[slot].set(v)[:MAX_FEATURES]

    sel_level = compact(flat_lvl)
    sel_y = compact(flat_ys)
    sel_x = compact(flat_xs)
    sel_resp = compact(flat_resp.astype(jnp.float32))
    n_sel = jnp.sum(flat_keep.astype(jnp.int32))
    sel_valid = jnp.arange(MAX_FEATURES) < jnp.minimum(n_sel, MAX_FEATURES)

    return _stage_b(pyr, spec, sel_level, sel_y, sel_x, sel_resp, sel_valid, depth_img, cam)


class OrbExtractor:
    """Drop-in capability match for the reference ORBextractor::operator()
    (ORBextractor.h:59-61), TPU-structured."""

    def __init__(
        self,
        camera: Camera,
        n_features: int = 1000,
        scale_factor: float = 1.2,
        n_levels: int = 8,
        fast_hi: int = 20,
        fast_lo: int = 7,
        cell_top_k: int = 8,
    ):
        self.camera = camera
        self.spec = PyramidSpec(camera.width, camera.height, n_levels, scale_factor)
        self.n_features = n_features
        self.budget = self.spec.budget(n_features)
        self.fast_hi = float(fast_hi)
        self.fast_lo = float(fast_lo)
        self.cell_top_k = cell_top_k

    def _distribute(self, cands) -> Tuple[np.ndarray, ...]:
        """Host quadtree over stage-A candidates -> padded selection arrays."""
        ys = np.asarray(cands.ys).reshape(self.spec.n_levels, -1)
        xs = np.asarray(cands.xs).reshape(self.spec.n_levels, -1)
        resp = np.asarray(cands.response).reshape(self.spec.n_levels, -1)
        valid = np.asarray(cands.valid).reshape(self.spec.n_levels, -1)

        sel_level, sel_y, sel_x, sel_r = [], [], [], []
        b = fast.DETECT_BORDER
        for lvl in range(self.spec.n_levels):
            m = valid[lvl]
            if not m.any():
                continue
            lx, ly, lr = xs[lvl][m], ys[lvl][m], resp[lvl][m]
            h, w = self.spec.sizes[lvl]
            keep = distribute_octtree(
                lx.astype(np.float32), ly.astype(np.float32), lr,
                b, w - b, b, h - b, self.budget[lvl],
            )
            sel_level.append(np.full(keep.size, lvl, np.int32))
            sel_x.append(lx[keep])
            sel_y.append(ly[keep])
            sel_r.append(lr[keep])

        if sel_level:
            level = np.concatenate(sel_level)
            x = np.concatenate(sel_x).astype(np.int32)
            y = np.concatenate(sel_y).astype(np.int32)
            r = np.concatenate(sel_r).astype(np.float32)
        else:
            level = np.empty(0, np.int32)
            x = y = np.empty(0, np.int32)
            r = np.empty(0, np.float32)

        if level.size > MAX_FEATURES:  # rare overflow: keep strongest
            order = np.argsort(-r)[:MAX_FEATURES]
            level, x, y, r = level[order], x[order], y[order], r[order]

        n = level.size
        pad = MAX_FEATURES - n
        return (
            np.pad(level, (0, pad)),
            np.pad(y, (0, pad)),
            np.pad(x, (0, pad)),
            np.pad(r, (0, pad)),
            np.pad(np.ones(n, bool), (0, pad)),
        )

    def __call__(self, gray: np.ndarray, depth: np.ndarray) -> FrameFeatures:
        """gray u8 (H, W), depth f32 meters (H, W) -> FrameFeatures."""
        pyr, cands = _stage_a(
            jnp.asarray(gray), self.spec, self.fast_hi, self.fast_lo, self.cell_top_k
        )
        level, ys, xs, resp, valid = self._distribute(jax.device_get(cands))
        return _stage_b(
            pyr,
            self.spec,
            jnp.asarray(level),
            jnp.asarray(ys),
            jnp.asarray(xs),
            jnp.asarray(resp),
            jnp.asarray(valid),
            jnp.asarray(depth, dtype=jnp.float32),
            self.camera,
        )
