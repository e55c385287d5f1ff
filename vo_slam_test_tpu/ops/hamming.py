"""256-bit Hamming distances for ORB descriptors.

The reference computes one distance at a time with XOR + SWAR popcount
(reference: matcher.cpp:1240-1256). On TPU, data association wants the whole
N x M distance matrix at once:

- ``distance_matrix`` (XOR+popcount, VPU): exact, good to ~1k x 1k.
- ``distance_matrix_mxu`` (popcount-GEMM, MXU): expand descriptors to
  {0,1}^256 planes; for binary vectors a, b:
      hamming = popcnt(a) + popcnt(b) - 2 * (a . b)
  so one int8/bf16 GEMM of [N, 256] x [256, M] gives the full matrix.
  Wins for large candidate sets (BoW vocab transform, loop retrieval).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def popcount_u32(v: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount over uint32 lanes."""
    v = v.astype(jnp.uint32)
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamming distance between aligned descriptor arrays.

    a, b: (..., 8) uint32 -> (...,) int32 in [0, 256].
    """
    return jnp.sum(popcount_u32(a ^ b), axis=-1)


def distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] x [M, 8] uint32 -> [N, M] int32 Hamming distances (exact)."""
    return jnp.sum(popcount_u32(a[:, None, :] ^ b[None, :, :]), axis=-1)


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] {0,1} int8 bit planes (bit b of word w at
    column 32w+b, matching brief.py's packing)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(jnp.int8)


def distance_matrix_mxu(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] x [M, 8] uint32 -> [N, M] int32 via one int8 GEMM on the MXU."""
    abits = unpack_bits(a)
    bbits = unpack_bits(b)
    pa = jnp.sum(abits.astype(jnp.int32), axis=1)  # popcounts
    pb = jnp.sum(bbits.astype(jnp.int32), axis=1)
    dots = jax.lax.dot_general(
        abits, bbits,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return pa[:, None] + pb[None, :] - 2 * dots
