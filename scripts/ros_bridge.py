#!/usr/bin/env python3
"""ROS -> WCST bridge: drive ``--stream`` from a live ROS1 robot.

The reference's online mode subscribes directly to ROS topics
(/root/reference/src/wildcat_slam_node.cc:71-77: /alphasense/imu +
/hesai/pandar with bounded queues). The rebuild's online mode consumes the
transport-agnostic WCST framed stream instead (wildcat_slam_tpu/io/stream.py),
so a robot already speaking ROS needs this adapter: it subscribes to the same
two topics and re-emits each message as a WCST frame on stdout or a TCP
connection — zero core dependencies, rospy imported lazily, host-side only.

    ros_bridge.py --imu-topic /alphasense/imu --lidar-topic /hesai/pandar | \
        python -m wildcat_slam_tpu.cli --stream - --verbose

Messages are subscribed as ``rospy.AnyMsg`` (raw serialized bytes) and parsed
with the SAME field-discovering parsers the bag reader uses
(io/rosbag.py _parse_imu/_parse_pointcloud2), so every point layout the
offline path accepts — Hilti, permuted fields, relative-f32 per-point time —
works live too, and the two paths cannot drift apart.

The conversion core (:class:`BridgeCore`) is transport-free and unit-tested
against a fake rospy (tests/test_ros_bridge.py); only :func:`main` touches an
actual ROS graph.
"""

from __future__ import annotations

import argparse
import os
import socket
import sys
import threading
from typing import BinaryIO

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wildcat_slam_tpu.io import stream as wcst
from wildcat_slam_tpu.io.rosbag import _parse_imu, _parse_pointcloud2


class BridgeCore:
    """Serialized ROS message bytes in, WCST frames out.

    Parse failures are counted, never fatal: a live bridge must survive the
    occasional malformed message (the CLI consumer applies the same
    drop-and-count policy to out-of-order stamps).
    """

    def __init__(self, out: BinaryIO):
        self.out = out
        self._lock = threading.Lock()  # rospy delivers on multiple threads
        self.counts = {"imu": 0, "scan": 0, "imu_bad": 0, "scan_bad": 0}

    def handle_imu(self, data: bytes) -> None:
        try:
            t, acc, gyr = _parse_imu(data)
        except Exception:
            self.counts["imu_bad"] += 1
            return
        with self._lock:
            wcst.write_imu(self.out, t, acc, gyr)
            self.out.flush()
            self.counts["imu"] += 1

    def handle_scan(self, data: bytes) -> None:
        try:
            times, pts = _parse_pointcloud2(data)
        except Exception:
            self.counts["scan_bad"] += 1
            return
        with self._lock:
            wcst.write_scan(self.out, times, pts)
            self.out.flush()
            self.counts["scan"] += 1

    def finish(self) -> None:
        with self._lock:
            wcst.write_end(self.out)
            self.out.flush()


def _open_out(spec: str) -> BinaryIO:
    if spec == "-":
        return sys.stdout.buffer
    if spec.startswith("tcp:"):
        _, host, port = spec.split(":")
        s = socket.create_connection((host, int(port)))
        return s.makefile("wb")
    return open(spec, "wb")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Bridge live ROS1 sensor topics to a WCST stream "
                    "(consume with: python -m wildcat_slam_tpu.cli --stream -)")
    ap.add_argument("--imu-topic", default="/alphasense/imu",
                    help="sensor_msgs/Imu topic (reference default)")
    ap.add_argument("--lidar-topic", default="/hesai/pandar",
                    help="sensor_msgs/PointCloud2 topic (reference default)")
    ap.add_argument("--out", default="-", metavar="DEST",
                    help="'-' = stdout (pipe into the CLI), 'tcp:HOST:PORT', "
                         "or a file/FIFO path")
    ap.add_argument("--imu-queue", type=int, default=100000,
                    help="rospy subscriber queue (reference: 100000)")
    ap.add_argument("--lidar-queue", type=int, default=512,
                    help="rospy subscriber queue (scans are large; the "
                         "reference's 10000 would hide GBs of backlog)")
    args = ap.parse_args(argv)

    try:
        import rospy
    except ImportError:
        print("ros_bridge: rospy not available — this adapter needs a ROS1 "
              "environment (source /opt/ros/<distro>/setup.bash). The "
              "odometry itself has no ROS dependency: record a bag and use "
              "--bag, or emit WCST frames directly (io/stream.py).",
              file=sys.stderr)
        return 2

    core = BridgeCore(_open_out(args.out))
    rospy.init_node("wildcat_wcst_bridge", anonymous=True,
                    disable_signals=False)
    # AnyMsg hands over the raw serialized buffer — same bytes a bag stores,
    # same parsers as the offline path
    rospy.Subscriber(args.imu_topic, rospy.AnyMsg,
                     lambda m: core.handle_imu(m._buff),
                     queue_size=args.imu_queue)
    rospy.Subscriber(args.lidar_topic, rospy.AnyMsg,
                     lambda m: core.handle_scan(m._buff),
                     queue_size=args.lidar_queue)
    rospy.spin()
    core.finish()
    print(f"ros_bridge: forwarded {core.counts['imu']} IMU / "
          f"{core.counts['scan']} scans"
          + (f", dropped {core.counts['imu_bad']} IMU / "
             f"{core.counts['scan_bad']} scans as unparseable"
             if core.counts["imu_bad"] or core.counts["scan_bad"] else ""),
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
