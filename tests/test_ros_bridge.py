"""ROS->WCST bridge producer (scripts/ros_bridge.py): the live-robot adapter
closing the reference's online-mode interop gap (wildcat_slam_node.cc:71-77).
No ROS in this image, so main() runs against a fake rospy module; the
conversion core is fed the same serialized bytes a real subscriber delivers
(synthesized with the bag writer's serializers — shared wire format)."""

import importlib.util
import io
import os
import sys
import types

import numpy as np
import pytest

from wildcat_slam_tpu.io import stream as ws
from wildcat_slam_tpu.io.rosbag import _ser_imu, _ser_pointcloud2


def _load_bridge():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "scripts", "ros_bridge.py")
    spec = importlib.util.spec_from_file_location("ros_bridge", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _scan(t0, n=5, val=1.0):
    times = t0 + np.arange(n) * 1e-4
    pts = np.full((n, 3), val, np.float64)
    return times, pts


class TestBridgeCore:
    def test_roundtrip_through_wcst(self):
        bridge = _load_bridge()
        buf = io.BytesIO()
        core = bridge.BridgeCore(buf)

        core.handle_imu(_ser_imu(1.00, [0, 0, 9.81], [0.1, 0, 0]))
        times, pts = _scan(1.01)
        core.handle_scan(_ser_pointcloud2(times, pts))
        core.handle_imu(_ser_imu(1.02, [0, 0, 9.80], [0, 0.2, 0]))
        core.finish()

        buf.seek(0)
        evs = list(ws.read_stream(buf))
        assert [e[0] for e in evs] == ["imu", "scan", "imu"]
        assert evs[0][1] == pytest.approx(1.00)
        np.testing.assert_allclose(evs[0][2], [0, 0, 9.81])
        np.testing.assert_allclose(evs[1][1], times, atol=1e-7)
        np.testing.assert_allclose(evs[1][2], pts, atol=1e-6)
        assert core.counts == {"imu": 2, "scan": 1, "imu_bad": 0, "scan_bad": 0}

    def test_unparseable_messages_counted_not_fatal(self):
        bridge = _load_bridge()
        buf = io.BytesIO()
        core = bridge.BridgeCore(buf)
        core.handle_imu(b"\x00\x01")         # truncated
        core.handle_scan(b"garbage")
        core.handle_imu(_ser_imu(2.0, [0, 0, 9.81], [0, 0, 0]))
        core.finish()
        buf.seek(0)
        evs = list(ws.read_stream(buf))
        assert [e[0] for e in evs] == ["imu"]
        assert core.counts["imu_bad"] == 1 and core.counts["scan_bad"] == 1

    def test_nonhilti_layout_accepted(self):
        # the bridge shares the bag reader's field-discovering parser, so the
        # permuted/relative-f32 quirk layouts work live too
        bridge = _load_bridge()
        buf = io.BytesIO()
        core = bridge.BridgeCore(buf)
        # realistic epoch stamp: the parser's absolute-vs-relative time
        # heuristic keys off proximity to the header stamp
        times, pts = _scan(1.6e9)
        core.handle_scan(_ser_pointcloud2(times, pts, layout="relative_f32"))
        core.finish()
        buf.seek(0)
        evs = list(ws.read_stream(buf))
        assert evs[0][0] == "scan"
        np.testing.assert_allclose(evs[0][1], times, atol=1e-5)


class TestMainAgainstFakeRospy:
    def test_main_subscribes_and_forwards(self, tmp_path, monkeypatch):
        bridge = _load_bridge()

        class FakeMsg:
            def __init__(self, buff):
                self._buff = buff

        subs = {}

        class FakeRospy(types.ModuleType):
            AnyMsg = object

            @staticmethod
            def init_node(name, anonymous=False, disable_signals=False):
                assert name == "wildcat_wcst_bridge"

            @staticmethod
            def Subscriber(topic, msg_type, cb, queue_size=0):
                assert queue_size > 0
                subs[topic] = cb

            @staticmethod
            def spin():
                # deliver a tiny interleaved session, as the ROS graph would
                subs["/alphasense/imu"](FakeMsg(_ser_imu(1.0, [0, 0, 9.81], [0, 0, 0])))
                times, pts = _scan(1.01)
                subs["/hesai/pandar"](FakeMsg(_ser_pointcloud2(times, pts)))
                subs["/alphasense/imu"](FakeMsg(_ser_imu(1.02, [0, 0, 9.81], [0, 0, 0])))

        fake = FakeRospy("rospy")
        monkeypatch.setitem(sys.modules, "rospy", fake)

        out = str(tmp_path / "bridge.wcst")
        rc = bridge.main(["--out", out])
        assert rc == 0
        with open(out, "rb") as f:
            evs = list(ws.read_stream(f))
        assert [e[0] for e in evs] == ["imu", "scan", "imu"]

    def test_main_without_rospy_exits_cleanly(self, monkeypatch, capsys):
        bridge = _load_bridge()
        monkeypatch.setitem(sys.modules, "rospy", None)  # import -> ImportError
        rc = bridge.main(["--out", "-"])
        assert rc == 2
        assert "rospy not available" in capsys.readouterr().err
