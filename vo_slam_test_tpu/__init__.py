"""vo_slam_test_tpu — TPU-native RGB-D ORB-SLAM framework (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of guisongchen/vo_slam_test
(an ORB-SLAM2 RGB-D rewrite in C++/Ceres) for TPU hardware:

- Feature extraction (pyramid / FAST / orientation / rBRIEF) as batched,
  fixed-shape XLA + Pallas programs over a pyramid *atlas*.
- Data association as popcount-GEMM Hamming-distance matrices on the MXU
  with spatial/rotation masks, instead of pointer-chasing grid searches.
- All nonlinear solvers (pose-only SE3, windowed local BA with Schur
  elimination, Sim3, essential-graph) as a batched Levenberg-Marquardt
  engine in JAX with analytic Jacobians.
- Map state as padded struct-of-arrays (masked), swapped atomically by the
  host pipeline threads (tracking / local mapping / loop closing).

Reference behavior citations point into /root/reference (file:line).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# SLAM geometry (pose chains, Jacobian products, point transforms) is
# precision-sensitive: TPU f32 matmuls default to bf16 MXU passes, which is
# catastrophic for pose accuracy. Default to full-precision f32 matmuls;
# throughput-critical kernels (e.g. the popcount-GEMM Hamming matcher) opt
# into low precision explicitly with integer/bf16 operand dtypes.
if _os.environ.get("VO_SLAM_TPU_NO_PRECISION_OVERRIDE", "0") != "1":
    _jax.config.update("jax_default_matmul_precision", "highest")

# The per-frame SLAM step is one large fused program; persist compiled
# artifacts across processes so CLIs/benchmarks don't pay a multi-minute
# compile on every launch. TPU-only: CPU AOT artifacts written by the
# remote compile service target a different machine type and execute with
# silently wrong numerics when loaded here (cpu_aot_loader feature
# mismatch) — anything forcing jax_platforms=cpu must disable the cache
# (tests/conftest.py does).
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR") and not _jax.config.jax_compilation_cache_dir:
    # respect a cache dir configured before import (tests/conftest.py
    # points at a dedicated CPU-local dir for correct CPU numerics)
    _cache = _os.path.expanduser("~/.cache/jax_vo_slam_tpu")
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

