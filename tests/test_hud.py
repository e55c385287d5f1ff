"""Per-frame HUD render (reference Drawer::drawCurrFrameImg,
drawer.cpp:368-459): keypoint boxes colored by tracking provenance plus a
status bar. Pure-host test — no SlamSystem compile."""

import numpy as np

from vo_slam_test_tpu.viz.drawer import draw_hud_frame


class TestHud:
    def test_boxes_and_status_bar(self):
        rng = np.random.default_rng(0)
        H, W = 120, 160
        gray = rng.integers(0, 255, (H, W), np.uint8)
        uv = np.array([[30, 40], [80, 60], [140, 100], [500, 500]], np.float32)
        state = np.array([1, 2, 0, 1], np.int32)  # map, vo, none, off-image
        img = draw_hud_frame(gray, uv, state, ok=True, frame_id=7)
        assert img.shape == (H + 22, W, 3)
        # green box around the map-tracked keypoint
        assert (img[35, 25:36, 1] == 255).any()
        assert (img[35, 25:36, 0] == 0).any()
        # blue-ish box around the VO-tracked keypoint
        bpx = img[55, 75:86]
        assert (bpx[:, 2] > bpx[:, 1]).any()
        # untracked keypoint area unchanged (no pure-green pixel)
        patch = img[95:106, 134:146]
        assert not ((patch[..., 1] == 255) & (patch[..., 0] == 0)).any()
        # status bar has light text pixels on dark background
        bar = img[H:]
        assert (bar > 200).any() and (bar < 40).any()

    def test_lost_frame_draws_nothing(self):
        gray = np.zeros((60, 80), np.uint8)
        uv = np.array([[20, 20]], np.float32)
        img = draw_hud_frame(gray, uv, np.array([1]), ok=False)
        # state flags come pre-masked by the pipeline on LOST frames; the
        # drawer still renders whatever flags it is given — the box shows
        assert img.shape == (82, 80, 3)
