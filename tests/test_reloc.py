"""Milestone C: BoW relocalization after sensor dropout (kidnap scenario)."""

import numpy as np
import pytest

from vo_slam_test_tpu.bow.vocabulary import build_vocabulary
from vo_slam_test_tpu.camera import Camera
from vo_slam_test_tpu.config import SlamConfig
from vo_slam_test_tpu.datasets import SyntheticRGBD
from vo_slam_test_tpu.frontend.extractor import OrbExtractor
from vo_slam_test_tpu.pipeline.system import SlamSystem
from vo_slam_test_tpu.slam_map.map_state import MapCaps

pytestmark = pytest.mark.slow  # multi-minute: full SlamSystem compiles


def make_cfg(seq):
    return SlamConfig(
        camera_fx=seq.fx, camera_fy=seq.fy, camera_cx=seq.cx, camera_cy=seq.cy,
        camera_k1=0, camera_k2=0, camera_p1=0, camera_p2=0, camera_k3=0,
    )


@pytest.fixture(scope="module")
def scene_voc():
    seq = SyntheticRGBD(n_frames=3, seed=31, motion_scale=0.3)
    cfg = make_cfg(seq)
    ext = OrbExtractor(Camera.from_config(cfg), n_features=1000)
    descs = []
    for i in range(3):
        g, d, _ = seq[i]
        f = ext(g, d)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    return build_vocabulary(np.concatenate(descs), k=8, levels=3, seed=2)


class TestRelocalization:
    def test_kidnap_recovery(self, scene_voc):
        seq = SyntheticRGBD(n_frames=12, seed=31, motion_scale=0.3)
        cfg = make_cfg(seq)
        sys_ = SlamSystem(cfg, caps=MapCaps(max_kf=32, max_pt=8192), vocabulary=scene_voc)

        # phase 1: normal tracking builds the map
        for i in range(8):
            g, d, ts = seq[i]
            sys_.track(g, d, ts)
        # phase 2: sensor dropout (black frames) -> tracking lost
        black_g = np.zeros((480, 640), np.uint8)
        black_d = np.zeros((480, 640), np.float32)
        for j in range(3):
            sys_.track(black_g, black_d, 8.0 + j)
        # phase 3: sensor returns at a previously-mapped viewpoint
        for i in range(2, 6):
            g, d, ts = seq[i]
            sys_.track(g, d, 20.0 + i)

        traj, stats, _ = sys_.results()
        oks = [s.ok for s in stats]
        assert all(oks[:8]), oks[:8]            # mapped fine
        assert not any(oks[8:11]), oks[8:11]    # lost during dropout
        assert any(oks[11:]), oks[11:]          # relocalized after
        reloc = sys_.reloc_frames
        assert len(reloc) >= 1 and reloc[0] >= 11, reloc
        # recovered pose must be consistent with the mapped trajectory
        first_ok = 11 + oks[11:].index(True)
        src = first_ok - 11 + 2  # frame i of phase 3
        gt = seq.poses[src]
        est = traj[first_ok]
        terr = np.linalg.norm(est[:3, 3] - gt[:3, 3])
        # alignment gauge: compare against the same-frame estimate of phase 1
        est_ref = traj[src]
        rel = np.linalg.norm(est[:3, 3] - est_ref[:3, 3])
        assert rel < 0.05, (terr, rel)

    def test_kidnap_recovery_depth_poor(self, scene_voc):
        """Return frames carry NO depth: the EPnP 2D-3D branch
        (visualOdometry.cpp:806-826 role) must recover where Horn 3D-3D
        cannot."""
        seq = SyntheticRGBD(n_frames=12, seed=31, motion_scale=0.3)
        cfg = make_cfg(seq)
        sys_ = SlamSystem(cfg, caps=MapCaps(max_kf=32, max_pt=8192), vocabulary=scene_voc)
        for i in range(8):
            g, d, ts = seq[i]
            sys_.track(g, d, ts)
        black_g = np.zeros((480, 640), np.uint8)
        black_d = np.zeros((480, 640), np.float32)
        for j in range(3):
            sys_.track(black_g, black_d, 8.0 + j)
        zero_d = np.zeros((480, 640), np.float32)
        for i in range(2, 6):
            g, _, ts = seq[i]
            sys_.track(g, zero_d, 20.0 + i)

        traj, stats, _ = sys_.results()
        oks = [s.ok for s in stats]
        assert any(oks[11:]), oks[11:]
        reloc = sys_.reloc_frames
        assert len(reloc) >= 1 and reloc[0] >= 11, reloc
        first_ok = 11 + oks[11:].index(True)
        src = first_ok - 11 + 2
        est = traj[first_ok]
        est_ref = traj[src]
        rel = np.linalg.norm(est[:3, 3] - est_ref[:3, 3])
        assert rel < 0.05, rel

    def test_kidnap_recovery_decoy_best_candidate(self, scene_voc):
        """A decoy keyframe carries the query's exact BoW vector (so it
        ranks FIRST) but garbage descriptors and no map points, so it can
        never pass the >=15 BoW-match gate. Multi-candidate relocalization
        (visualOdometry.cpp:313-395 iterates ALL candidates) must still
        recover through the genuine keyframe in the same frame."""
        import jax.numpy as jnp

        from vo_slam_test_tpu.bow import retrieval as bow_ret
        from vo_slam_test_tpu.bow import vocabulary as bow_voc

        seq = SyntheticRGBD(n_frames=12, seed=31, motion_scale=0.3)
        cfg = make_cfg(seq)
        sys_ = SlamSystem(cfg, caps=MapCaps(max_kf=32, max_pt=8192), vocabulary=scene_voc)
        for i in range(8):
            g, d, ts = seq[i]
            sys_.track(g, d, ts)
        black_g = np.zeros((480, 640), np.uint8)
        black_d = np.zeros((480, 640), np.float32)
        for j in range(3):
            sys_.track(black_g, black_d, 8.0 + j)

        # build the decoy from the first return frame's BoW vector
        ext = OrbExtractor(Camera.from_config(cfg), n_features=1000)
        g2, d2, _ = seq[2]
        f2 = ext(g2, d2)
        words = bow_voc.transform(scene_voc, f2.desc, f2.valid)
        uniq, wgt = bow_ret.bow_vector(words, scene_voc.idf)

        m = sys_.map
        slot = int(np.asarray(m.n_kf))  # unused row
        rng = np.random.default_rng(5)
        decoy_desc = jnp.asarray(
            rng.integers(0, 2**32, size=(m.kf_desc.shape[1], 8), dtype=np.uint32)
        )
        sys_.map = m.replace(
            kf_valid=m.kf_valid.at[slot].set(True),
            kf_bow_word=m.kf_bow_word.at[slot].set(uniq),
            kf_bow_weight=m.kf_bow_weight.at[slot].set(wgt),
            kf_desc=m.kf_desc.at[slot].set(decoy_desc),
            kf_kp_valid=m.kf_kp_valid.at[slot].set(True),
        )

        for i in range(2, 6):
            g, d, ts = seq[i]
            sys_.track(g, d, 20.0 + i)

        traj, stats, _ = sys_.results()
        oks = [s.ok for s in stats]
        assert any(oks[11:]), oks[11:]
        reloc = sys_.reloc_frames
        # recovery in the SAME frame as the decoy-free kidnap test: the
        # decoy outranks the true keyframe but cannot block it
        assert len(reloc) >= 1 and reloc[0] == 11, reloc

    def test_reloc_parity_mode_same_trigger_frame(self, scene_voc):
        """A/B: the kidnap scenario relocalizes on the SAME frame under the
        default mode (best-of-top-3, Horn when depth-rich) and the parity
        mode (all-candidate first-success with always-EPnP + per-candidate
        top-ups, visualOdometry.cpp:313-395/:806). The two modes may pick
        different candidate keyframes; the externally observable quantity —
        WHICH frame relocalization succeeds on — must agree here."""
        frames = {}
        for parity in (False, True):
            seq = SyntheticRGBD(n_frames=12, seed=31, motion_scale=0.3)
            cfg = make_cfg(seq)
            sys_ = SlamSystem(cfg, caps=MapCaps(max_kf=32, max_pt=8192),
                              vocabulary=scene_voc, reloc_parity=parity)
            for i in range(8):
                g, d, ts = seq[i]
                sys_.track(g, d, ts)
            black_g = np.zeros((480, 640), np.uint8)
            black_d = np.zeros((480, 640), np.float32)
            for j in range(3):
                sys_.track(black_g, black_d, 8.0 + j)
            for i in range(2, 6):
                g, d, ts = seq[i]
                sys_.track(g, d, 20.0 + i)
            _, stats, _ = sys_.results()
            assert any(s.ok for s in stats[11:]), (parity, [s.ok for s in stats])
            reloc = sys_.reloc_frames
            assert len(reloc) >= 1, (parity, reloc)
            frames[parity] = reloc[0]
        assert frames[False] == frames[True], frames

    def test_no_bow_system_never_relocalizes(self):
        seq = SyntheticRGBD(n_frames=4, seed=33, motion_scale=0.3)
        sys_ = SlamSystem(make_cfg(seq), caps=MapCaps(max_kf=16, max_pt=4096))
        for i in range(4):
            g, d, ts = seq[i]
            sys_.track(g, d, ts)
        assert sys_.reloc_frames == []

    def test_vocabulary_includes_lost_frame_descriptors(self):
        """Lost frames with real texture contribute their descriptors to
        vocabulary creation (map.cpp:79-83): the system loses tracking on a
        textured frame from a DIFFERENT scene, and that frame's descriptors
        must appear in the vocabulary build set."""
        seq = SyntheticRGBD(n_frames=4, seed=33, motion_scale=0.3)
        sys_ = SlamSystem(make_cfg(seq), caps=MapCaps(max_kf=16, max_pt=4096))
        for i in range(3):
            g, d, ts = seq[i]
            sys_.track(g, d, ts)
        # a textured frame from an unrelated scene -> lost, but has features
        other = SyntheticRGBD(n_frames=2, seed=77, motion_scale=2.5)
        g2, d2, _ = other[1]
        sys_.track(g2, d2, 99.0)
        _, stats, _ = sys_.results()
        assert not stats[3].ok  # genuinely lost
        kf_descs, lost_descs = sys_._vocabulary_descriptors()
        assert len(lost_descs) >= 1
        assert sum(d.shape[0] for d in lost_descs) > 100
        voc = sys_.create_vocabulary(k=6, levels=2)
        assert voc is not None
