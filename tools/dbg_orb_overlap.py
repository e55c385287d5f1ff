"""Attribute the oracle keypoint-overlap gap to FAST vs quad-tree stages."""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp
import numpy as np

from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.frontend.extractor import OrbExtractor, _stage_a
from vo_slam_test_tpu.native.orb_oracle import reference_extract
from vo_slam_test_tpu.ops.pyramid import PyramidSpec


def main():
    seq = SyntheticRGBD(n_frames=1, seed=3)
    gray, depth, _ = seq[0]
    rng = np.random.default_rng(42)
    noise = (rng.random((480, 640)) * 255).astype(np.uint8)

    cam = Camera.from_config(
        SlamConfig(camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0))
    ext = OrbExtractor(cam)
    spec = PyramidSpec(640, 480, 8, 1.2)
    scales = np.asarray(spec.scales)

    for name, img in (("synthetic", gray), ("noise", noise)):
        kr, _ = reference_extract(img)
        ref_lvl = kr[:, 3].astype(np.int64)
        ref_lx = np.rint(kr[:, 0] / scales[ref_lvl]).astype(np.int64)
        ref_ly = np.rint(kr[:, 1] / scales[ref_lvl]).astype(np.int64)

        _, cands = _stage_a(jnp.asarray(img), spec, 20.0, 7.0, 8)
        ys = np.asarray(cands.ys).reshape(8, -1)
        xs = np.asarray(cands.xs).reshape(8, -1)
        valid = np.asarray(cands.valid).reshape(8, -1)

        cand_sets = []
        for lvl in range(8):
            m = valid[lvl]
            cand_sets.append(set(zip(xs[lvl][m].tolist(), ys[lvl][m].tolist())))

        ko = ext(img, np.ones((480, 640), np.float32))
        uv = np.asarray(ko.uv)[np.asarray(ko.valid)]
        ov = np.asarray(ko.octave)[np.asarray(ko.valid)]
        ours_sets = [set() for _ in range(8)]
        for (x, y), o in zip(uv, ov):
            ours_sets[o].add((int(np.rint(x / scales[o])), int(np.rint(y / scales[o]))))

        n_ref = len(kr)
        in_cand = in_sel = near_cand = 0
        miss_by_lvl = np.zeros(8, int)
        for lx, ly, lv in zip(ref_lx, ref_ly, ref_lvl):
            p = (int(lx), int(ly))
            if p in ours_sets[lv]:
                in_sel += 1
            elif p in cand_sets[lv]:
                in_cand += 1
            else:
                miss_by_lvl[lv] += 1
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        if (p[0] + dx, p[1] + dy) in cand_sets[lv]:
                            near_cand += 1
                            break
                    else:
                        continue
                    break
        print(f"== {name}: ref {n_ref}")
        print(f"   selected by ours:        {in_sel} ({in_sel/n_ref:.3f})")
        print(f"   in candidates, not sel:  {in_cand} ({in_cand/n_ref:.3f})  <- quad-tree stage")
        print(f"   NOT in our candidates:   {n_ref-in_sel-in_cand} "
              f"({(n_ref-in_sel-in_cand)/n_ref:.3f})  <- FAST stage; "
              f"of those {near_cand} have a 1px-adjacent candidate")
        print(f"   missing-by-level: {miss_by_lvl.tolist()}")


if __name__ == "__main__":
    main()
