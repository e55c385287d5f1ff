"""Image pyramid as a fixed-shape padded level batch with reflect halos.

The reference builds an 8-level pyramid by chained cv::resize INTER_LINEAR
into buffers padded by EDGE_THRESHOLD=19 with BORDER_REFLECT_101
(reference: ORBextractor.cpp:1115-1142). Two behavioral subtleties are kept:

1. every level reproduces cv::resize's 8-bit INTER_LINEAR output
   BIT-EXACTLY: 11-bit fixed-point coefficients (cvRound of the float32
   weights, scale_x = 1/inv_scale_x, fx cast to float32 BEFORE the floor)
   and OpenCV's specialized u8 vertical cast
   ((b0*(S0>>4))>>16 + (b1*(S1>>4))>>16 + 2) >> 2 — so FAST responses,
   quad-tree winners, and descriptors match the reference's per-level
   pixels exactly (golden-tested to equality in tests/test_ops.py::
   test_levels_match_cv2_resize_chain_exactly, slow tier);
2. descriptor sampling may reach ~18 px outside a level for border
   keypoints; those reads land in the *unblurred* reflect halo, because the
   reference's GaussianBlur writes only inside the level view.

The TPU design stacks all levels into one padded canvas batch
[L, H+2*HALO, W+2*HALO] so every downstream stage (FAST, blur, orientation,
rBRIEF) runs as a single batched, fixed-shape program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

HALO = 19  # EDGE_THRESHOLD


@dataclasses.dataclass(frozen=True)
class PyramidSpec:
    """Static pyramid geometry (hashable; safe as a jit static argument)."""

    width: int
    height: int
    n_levels: int = 8
    scale_factor: float = 1.2

    @functools.cached_property
    def sizes(self) -> Tuple[Tuple[int, int], ...]:
        """((h, w) per level), using the reference's cvRound chaining."""
        out = [(self.height, self.width)]
        for lvl in range(1, self.n_levels):
            inv = 1.0 / (self.scale_factor**lvl)
            w = int(np.rint(self.width * inv))
            h = int(np.rint(self.height * inv))
            out.append((h, w))
        return tuple(out)

    @property
    def canvas_hw(self) -> Tuple[int, int]:
        # lane dim is padded so that 128-aligned patch DMAs of the fused
        # orientation/descriptor kernel (ops/orb_pallas.py) stay in bounds
        # for border keypoints: max aligned origin + patch width
        h = self.height + 2 * HALO
        w = self.width + 2 * HALO
        max_x0a = ((self.width - 16) // 128) * 128
        w = max(w, max_x0a + 256)
        return (h, w)

    @functools.cached_property
    def scales(self) -> np.ndarray:
        return np.array([self.scale_factor**l for l in range(self.n_levels)], np.float32)

    @functools.cached_property
    def inv_scales(self) -> np.ndarray:
        return (1.0 / self.scales).astype(np.float32)

    @functools.cached_property
    def level_sigma2(self) -> np.ndarray:
        """Per-level variance used by every chi^2 gate (scale^2)."""
        return (self.scales**2).astype(np.float32)

    @functools.cached_property
    def inv_level_sigma2(self) -> np.ndarray:
        return (1.0 / self.level_sigma2).astype(np.float32)

    def budget(self, num_features: int) -> Tuple[int, ...]:
        """Per-level target counts: geometric split of num_features
        (mirrors ORBextractor.cpp:439-451)."""
        q = 1.0 / self.scale_factor
        per0 = num_features * (1 - q) / (1 - q**self.n_levels)
        counts = []
        acc = 0
        val = per0
        for _ in range(self.n_levels - 1):
            c = int(round(val))
            counts.append(c)
            acc += c
            val *= q
        counts.append(max(num_features - acc, 0))
        return tuple(counts)


class Pyramid(NamedTuple):
    """Raw + blurred canvases; levels live at [HALO:HALO+h, HALO:HALO+w]."""

    raw: jnp.ndarray   # [L, H+2*HALO, W+2*HALO] f32 (halo: reflect of raw)
    blur: jnp.ndarray  # same, interior blurred, halo still raw-reflect


def _resize_linear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (float; non-parity utility)."""
    h_in, w_in = img.shape
    h_out, w_out = out_hw
    ys = (jnp.arange(h_out, dtype=jnp.float32) + 0.5) * (h_in / h_out) - 0.5
    xs = (jnp.arange(w_out, dtype=jnp.float32) + 0.5) * (w_in / w_out) - 0.5
    ys = jnp.clip(ys, 0.0, h_in - 1.0)
    xs = jnp.clip(xs, 0.0, w_in - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h_in - 1)
    x1 = jnp.minimum(x0 + 1, w_in - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx


@functools.lru_cache(maxsize=None)
def _u8_coeffs(n_in: int, n_out: int):
    """cv::resize 8U INTER_LINEAR fixed-point taps for one axis.

    Reproduces OpenCV's coefficient construction exactly: scale is
    1/inv_scale (NOT n_in/n_out — last-ulp different), the source
    coordinate is cast to float32 BEFORE cvFloor, the fractional part is
    float32 arithmetic, and the 11-bit taps are cvRound (round-half-even)
    of the float32 products. Returns (src_idx i32[n_out], a0, a1 i32)
    with src clamped so src+1 is always in range (boundary taps collapse
    to a0=0/a1=2048 there, OpenCV's xmax handling, same arithmetic)."""
    scale = 1.0 / (float(n_out) / float(n_in))
    dx = np.arange(n_out, dtype=np.float64)
    f32 = ((dx + 0.5) * scale - 0.5).astype(np.float32)
    sx = np.floor(f32).astype(np.int64)
    fx = f32 - sx.astype(np.float32)
    low = sx < 0
    sx[low] = 0
    fx[low] = 0.0
    hi = sx >= n_in - 1
    sx[hi] = n_in - 2
    fx[hi] = 1.0
    a1 = np.rint(fx * np.float32(2048.0)).astype(np.int32)
    a0 = np.rint((np.float32(1.0) - fx) * np.float32(2048.0)).astype(np.int32)
    # numpy, NOT jnp: a jnp constant created inside one jit trace and
    # cached would leak that trace's tracer into every later program that
    # builds a pyramid (measured: OrbExtractor warm-up then track_chunk)
    return (sx.astype(np.int32), a0, a1)


def _resize_u8_exact(img_u8_vals: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bit-exact cv::resize INTER_LINEAR for 8-bit images.

    `img_u8_vals` holds integral u8 values in any integer/float dtype;
    returns f32 with integral u8 values. The vertical stage is OpenCV's
    specialized u8 cast ((b0*(S0>>4))>>16 + (b1*(S1>>4))>>16 + 2) >> 2
    (the VResizeLinear<uchar,...> template OpenCV dispatches for 8U); all
    intermediates fit i32 (255*2048 horizontal, >>4 then *2048 vertical).
    Reference call site: ORBextractor.cpp:1129-1138 via cv::resize."""
    h_in, w_in = img_u8_vals.shape
    h_out, w_out = out_hw
    sx, ax0, ax1 = _u8_coeffs(w_in, w_out)
    sy, by0, by1 = _u8_coeffs(h_in, h_out)
    I = img_u8_vals.astype(jnp.int32)
    rows = I[:, sx] * ax0[None, :] + I[:, sx + 1] * ax1[None, :]
    s0 = rows[sy] >> 4
    s1 = rows[sy + 1] >> 4
    out = (((by0[:, None] * s0) >> 16) + ((by1[:, None] * s1) >> 16) + 2) >> 2
    return out.astype(jnp.float32)


def _reflect_pad(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 (edge pixel not repeated) == np.pad 'reflect'."""
    return jnp.pad(img, pad, mode="reflect")


def build_pyramid(gray_u8: jnp.ndarray, spec: PyramidSpec) -> Pyramid:
    """u8/f32 (H, W) image -> haloed raw + blurred canvases."""
    from .gaussian import gaussian_blur_7x7_u8

    img = gray_u8.astype(jnp.float32)
    levels: List[jnp.ndarray] = [img]
    for lvl in range(1, spec.n_levels):
        levels.append(_resize_u8_exact(levels[-1], spec.sizes[lvl]))

    CH, CW = spec.canvas_hw
    raws, blurs = [], []
    for lv in levels:
        h, w = lv.shape
        haloed = _reflect_pad(lv, HALO)
        # blur only the interior (the reference's view-scoped GaussianBlur);
        # the blur itself sees a virtual reflect border at the level edge.
        # Bit-exact u8 fixed-point path: rBRIEF comparisons then agree with
        # the reference to the bit (validated vs the compiled reference in
        # tests/test_orb_oracle.py).
        blurred_interior = gaussian_blur_7x7_u8(lv)
        haloed_blur = haloed.at[HALO : HALO + h, HALO : HALO + w].set(blurred_interior)
        pad_y, pad_x = CH - haloed.shape[0], CW - haloed.shape[1]
        raws.append(jnp.pad(haloed, ((0, pad_y), (0, pad_x))))
        blurs.append(jnp.pad(haloed_blur, ((0, pad_y), (0, pad_x))))
    return Pyramid(raw=jnp.stack(raws), blur=jnp.stack(blurs))


def interior(canvas: jnp.ndarray, spec: PyramidSpec) -> jnp.ndarray:
    """[L, CH, CW] canvas -> [L, H, W] view of the true level extents."""
    return canvas[:, HALO : HALO + spec.height, HALO : HALO + spec.width]


def level_valid_mask(spec: PyramidSpec, border: int = 0) -> np.ndarray:
    """[L, H, W] bool: pixels inside each level's true extent minus border."""
    H, W = spec.sizes[0]
    ys, xs = np.mgrid[0:H, 0:W]
    masks = []
    for h, w in spec.sizes:
        masks.append((ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border))
    return np.stack(masks)
