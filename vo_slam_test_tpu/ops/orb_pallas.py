"""Fused IC-angle + steered-rBRIEF as a Pallas TPU kernel.

The XLA formulation gathers 31x31 orientation patches (~1M scattered HBM
reads) and 512 descriptor samples per keypoint (~0.5M reads) — together the
dominant cost of extraction (~11 ms/frame on the profile). This kernel
flips the access pattern: per keypoint it DMAs one (8,128)-aligned patch
from each canvas into VMEM and resolves everything on-chip with tile-native
shapes. Mosaic constraints shaped the design:

- DMA sublane/lane origins must be tile-aligned: origins are rounded down
  and the remainders (dy in [0,8), dx in [0,128)) are absorbed into the
  arithmetic below; the pyramid canvas is widened so aligned patches of
  border keypoints stay in bounds (pyramid.canvas_hw);
- angles go through the cvFastAtan2 polynomial (pure VPU arithmetic, no
  table atan2) exactly as the reference quantizes them; degrees are
  recomputed outside from the raw moments with the same polynomial;
- no gathers / cross-tile reshapes: the circular moment mask is evaluated
  analytically from iotas (umax rows unrolled as one-hot sums), descriptor
  samples resolve with a separable one-hot — row-select as a
  [256,48] x [48,176] MXU matmul, column-select as a masked row sum;
- no scalar VMEM stores: outputs are written as 1-row vectors; the 256
  descriptor bits are packed by a constant matrix on the MXU into exact
  16-bit halves and assembled into uint32 words outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import orientation, pattern
from .pyramid import HALO

PATCH_H = 48          # rows DMA'd (8-aligned origin; dy in [0,8))
PATCH_W = 256         # lanes DMA'd (128-aligned origin and width; dx in [0,128))
C_OFF = 19            # keypoint sits at local (dy + 19, dx + 19)
KP_BLOCK = 8          # keypoints per program


@functools.lru_cache()
def _const_tables():
    p = pattern.bit_pattern_31().astype(np.float32)  # [256,4] x1 y1 x2 y2
    p1x = p[:, 0:1].copy()
    p1y = p[:, 1:2].copy()
    p2x = p[:, 2:3].copy()
    p2y = p[:, 3:4].copy()
    pack = np.zeros((32, 256), np.float32)
    for h in range(16):
        for b in range(16):
            pack[h, 16 * h + b] = float(1 << b)
    umax = pattern.umax_table()  # [16]
    return p1x, p1y, p2x, p2y, pack, tuple(int(v) for v in umax)


def _kernel(raw_ref, blur_ref, meta_ref,
            p1x_ref, p1y_ref, p2x_ref, p2y_ref, pack_ref,
            mom_out, half_out, raw_tile, blur_tile, sem):
    umax = _const_tables()[5]

    def per_kp(i, _):
        lv = meta_ref[i, 0]
        y0a = pl.multiple_of(meta_ref[i, 1], 8)
        x0a = pl.multiple_of(meta_ref[i, 2], 128)
        dy = meta_ref[i, 3]
        dx = meta_ref[i, 4]
        cy = dy + C_OFF
        cx = dx + C_OFF

        cp_raw = pltpu.make_async_copy(
            raw_ref.at[lv, pl.ds(y0a, PATCH_H), pl.ds(x0a, PATCH_W)], raw_tile, sem
        )
        cp_raw.start()
        cp_raw.wait()
        t_raw = raw_tile[:]

        # analytic circular-patch moment mask (umax rows one-hot unrolled)
        hh = jax.lax.broadcasted_iota(jnp.int32, (PATCH_H, PATCH_W), 0)
        ww = jax.lax.broadcasted_iota(jnp.int32, (PATCH_H, PATCH_W), 1)
        ry = hh - cy
        rx = ww - cx
        ay = jnp.abs(ry)
        ax = jnp.abs(rx)
        ulim = jnp.zeros_like(ay)
        for v, u in enumerate(umax):
            ulim = jnp.where(ay == v, u, ulim)
        mask = ((ay <= 15) & (ax <= ulim)).astype(jnp.float32)
        w_m = t_raw * mask
        m10 = jnp.sum(w_m * rx.astype(jnp.float32))
        m01 = jnp.sum(w_m * ry.astype(jnp.float32))
        # the reference rotates the rBRIEF pattern by cos/sin of the
        # fastAtan2-quantized DEGREE angle (computeOrbDescriptor); matching
        # its rounding means going through the same quantization
        deg = orientation.fast_atan2_deg(m01, m10)
        theta = deg * np.float32(np.pi / 180.0)
        ca = jnp.cos(theta)
        sa = jnp.sin(theta)

        cp_blur = pltpu.make_async_copy(
            blur_ref.at[lv, pl.ds(y0a, PATCH_H), pl.ds(x0a, PATCH_W)], blur_tile, sem
        )
        cp_blur.start()
        cp_blur.wait()
        t_blur = blur_tile[:]

        def endpoint(px_ref, py_ref):
            px = px_ref[:]  # [256,1]
            py = py_ref[:]
            sx = jnp.round(px * ca - py * sa).astype(jnp.int32) + cx
            sy = jnp.round(px * sa + py * ca).astype(jnp.int32) + cy
            oh_row = (
                jax.lax.broadcasted_iota(jnp.int32, (256, PATCH_H), 1) == sy
            ).astype(jnp.float32)
            M = jnp.dot(oh_row, t_blur, preferred_element_type=jnp.float32)
            oh_col = (
                jax.lax.broadcasted_iota(jnp.int32, (256, PATCH_W), 1) == sx
            ).astype(jnp.float32)
            return jnp.sum(M * oh_col, axis=1, keepdims=True)  # [256,1]

        s1 = endpoint(p1x_ref, p1y_ref)
        s2 = endpoint(p2x_ref, p2y_ref)
        bits = (s1 < s2).astype(jnp.float32)
        halves = jnp.dot(pack_ref[:], bits, preferred_element_type=jnp.float32)

        mom_out[pl.ds(i, 1), :] = jnp.stack([m10, m01])[None, :]
        half_out[pl.ds(i, 1), :] = halves[:, 0][None, :]
        return 0

    jax.lax.fori_loop(0, KP_BLOCK, per_kp, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def orb_angle_desc_pallas(
    canvas_raw: jnp.ndarray,   # [L, CH, CW]
    canvas_blur: jnp.ndarray,
    level: jnp.ndarray,        # [N] i32
    ys: jnp.ndarray,           # [N] level-image coords
    xs: jnp.ndarray,
    interpret: bool = False,
):
    """-> (angle_deg [N] f32, desc [N, 8] u32). Bit-compatible with
    ops/brief.py's packing."""
    L, CH, CW = canvas_raw.shape
    N = level.shape[0]
    assert N % KP_BLOCK == 0

    p1x, p1y, p2x, p2y, pack, _ = _const_tables()
    yc = ys + HALO - C_OFF
    xc = xs + HALO - C_OFF
    y0a = (yc // 8) * 8
    x0a = (xc // 128) * 128
    meta = jnp.stack([level, y0a, x0a, yc - y0a, xc - x0a], axis=1).astype(jnp.int32)

    mom, halves = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, 2), jnp.float32),
            jax.ShapeDtypeStruct((N, 32), jnp.float32),
        ),
        grid=(N // KP_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((KP_BLOCK, 5), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((KP_BLOCK, 2), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KP_BLOCK, 32), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((PATCH_H, PATCH_W), jnp.float32),
            pltpu.VMEM((PATCH_H, PATCH_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(canvas_raw, canvas_blur, meta,
      jnp.asarray(p1x), jnp.asarray(p1y), jnp.asarray(p2x), jnp.asarray(p2y),
      jnp.asarray(pack))

    deg = orientation.fast_atan2_deg(mom[:, 1], mom[:, 0])
    # assemble uint32 words from exact 16-bit halves (bit b of word w is
    # pair 32w+b, matching brief.py): half h holds bits 16h..16h+15
    h = halves[:, :16].astype(jnp.uint32)
    lo = h[:, 0::2]
    hi = h[:, 1::2]
    desc = lo | (hi << 16)
    return deg, desc.astype(jnp.uint32)
