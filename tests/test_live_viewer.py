"""Live viewer (viz/live.py): server round-trip and state encoding."""

import json
import urllib.request

import numpy as np

from wildcat_slam_tpu.viz.live import LiveViewer


def test_viewer_serves_page_and_state():
    v = LiveViewer(port=0)  # free port
    try:
        page = urllib.request.urlopen(f"http://127.0.0.1:{v.port}/", timeout=5).read()
        assert b"wildcat-slam-tpu live" in page
        assert b"cdn" not in page.lower()  # self-contained: zero-egress friendly

        v.update(3, 1.5, np.array([1.0, 2.0, 3.0]))
        st = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}/state", timeout=5).read())
        assert st["sweep"] == 3 and st["pose"] == [1.0, 2.0, 3.0]
        assert st["traj"] == [[1.0, 2.0, 3.0]]

        surf = dict(
            center=np.array([[0.0, 0.0, 1.0]]),
            radii=np.array([[0.01, 0.2, 0.3]]),
            axes=np.eye(3)[None],
            rgb=np.array([[0.5, 0.5, 1.0]]),
            timestamp=np.array([1.0]),
        )
        v.update(4, 2.0, np.array([1.0, 2.5, 3.0]), surf)
        st = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}/state", timeout=5).read())
        s = st["surfels"]
        assert len(s["c"]) == 1
        # a1 = largest 3-sigma axis (z * 0.3), a2 = middle (y * 0.2)
        np.testing.assert_allclose(s["a1"][0], [0.0, 0.0, 0.3], atol=1e-6)
        np.testing.assert_allclose(s["a2"][0], [0.0, 0.2, 0.0], atol=1e-6)
        assert len(st["traj"]) == 2
    finally:
        v.close()
