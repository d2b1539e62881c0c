"""Interactive viewer (export/live_viewer.py): the headless analog of the
reference's PhysX viewer + keyboard loop (base_task.py:104-110)."""

import os
import threading
import urllib.request

import numpy as np
import pytest

from humanoid_gym_tpu import XBOT_MJCF as FLAT_MJCF  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists(FLAT_MJCF), reason="reference MJCF not available"
)


def _make_viewer(fps=25):
    from humanoid_gym_tpu.export.live_viewer import LiveViewer
    from humanoid_gym_tpu.export.sim2sim import Sim2SimCfg

    policy = lambda obs: np.zeros(12)  # noqa: E731 — PD holds default pose
    cfg = Sim2SimCfg(mujoco_model_path=FLAT_MJCF, sim_duration=1.0)
    return LiveViewer(policy, cfg, fps=fps)


def test_step_render_and_keys():
    v = _make_viewer()
    # one render window advances sim time by ~1/fps
    v.step_policy_window()
    assert v.sim_time == pytest.approx(1 / 25, abs=2e-3)
    jpg = v.render_jpeg()
    assert jpg[:3] == b"\xff\xd8\xff" and len(jpg) > 5000  # real JPEG

    # teleop key map (viewer superset of reference ESC/V)
    v.apply_key("ArrowUp")
    v.apply_key("ArrowUp")
    v.apply_key("ArrowRight")
    v.apply_key("q")
    assert np.allclose(v.cmd, [0.2, -0.1, 0.2])
    v.apply_key(" ")
    assert np.allclose(v.cmd, 0.0)
    v.apply_key("v")
    assert v.paused
    v.apply_key("v")
    assert not v.paused
    v.apply_key("Escape")
    assert not v.running


def test_reset_and_push():
    v = _make_viewer()
    for _ in range(10):
        v.step_policy_window()
    qpos_moved = np.array(v.data.qpos)
    v.apply_key("p")  # lateral kick applied on next window
    v.step_policy_window()
    v.apply_key("r")  # reset restores the initial pose
    v.step_policy_window()
    assert np.linalg.norm(v.data.qpos - v._init_qpos) < np.linalg.norm(
        qpos_moved - v._init_qpos
    ) + 1e-9
    assert v.sim_time == pytest.approx(1 / 25, abs=2e-3)  # counter reset


def test_http_stream_serves_mjpeg():
    v = _make_viewer()
    port = 18807
    t = threading.Thread(
        target=v.serve, kwargs={"port": port}, daemon=True
    )
    t.start()
    try:
        # wait for the first frame, then pull the page and a stream chunk
        for _ in range(100):
            if v._frame_jpeg is not None:
                break
            import time

            time.sleep(0.05)
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=5
        ).read()
        assert b"viewer" in page
        req = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stream", timeout=5
        )
        chunk = req.read(40000)
        assert b"--frame" in chunk and b"\xff\xd8\xff" in chunk
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/key?k=Escape", timeout=5
        )
    finally:
        v.stop()
        t.join(timeout=5)
    assert not v.running
