"""Minimal pure-python ROS1 ``.bag`` reader (and writer, for tests).

The reference consumes Hilti-2021 rosbags directly (wildcat_slam_node.cc:80-99:
``rosbag::View`` over ``sensor_msgs/Imu`` on /alphasense/imu and
``sensor_msgs/PointCloud2`` on /hesai/pandar, with the per-point layout of
hilti_ros::Point — x/y/z/intensity float32, absolute ``time`` float64, ``ring``
uint16, common.h:12-28). This module reads the same bags without any ROS
dependency so a user of the reference can feed their data unchanged:

    for kind, *payload in read_bag("seq.bag"):
        if kind == "imu":   t, acc, gyr = payload
        else:               times, points = payload   # lidar frame

Supports bag format 2.0 with 'none' and 'bz2' chunk compression (stdlib); 'lz4'
is gated on the optional lz4 package. Only the two message types the pipeline
needs are deserialized; other topics are skipped.
"""

from __future__ import annotations

import bz2
import struct
from typing import Iterator, Optional, Tuple

import numpy as np

_OP_BAG_HEADER = 0x03
_OP_CHUNK = 0x05
_OP_CONNECTION = 0x07
_OP_MESSAGE = 0x02
_OP_INDEX = 0x04
_OP_CHUNK_INFO = 0x06


def _parse_header(buf: bytes) -> dict:
    fields = {}
    off = 0
    while off < len(buf):
        (flen,) = struct.unpack_from("<I", buf, off)
        off += 4
        entry = buf[off : off + flen]
        off += flen
        k, _, v = entry.partition(b"=")
        fields[k.decode()] = v
    return fields


def _records(buf: bytes) -> Iterator[Tuple[dict, bytes]]:
    off = 0
    n = len(buf)
    while off + 4 <= n:
        (hlen,) = struct.unpack_from("<I", buf, off)
        off += 4
        header = _parse_header(buf[off : off + hlen])
        off += hlen
        (dlen,) = struct.unpack_from("<I", buf, off)
        off += 4
        data = buf[off : off + dlen]
        off += dlen
        yield header, data


def _read_string(buf: bytes, off: int) -> Tuple[str, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    return buf[off + 4 : off + 4 + n].decode(errors="replace"), off + 4 + n


def _parse_imu(data: bytes):
    """sensor_msgs/Imu -> (t, acc (3,), gyr (3,)); t from the header stamp."""
    off = 4  # seq
    secs, nsecs = struct.unpack_from("<II", data, off)
    off += 8
    (n,) = struct.unpack_from("<I", data, off)
    off += 4 + n
    off += 4 * 8      # orientation quaternion
    off += 9 * 8      # orientation covariance
    gyr = np.frombuffer(data, "<f8", 3, off)
    off += 3 * 8 + 9 * 8
    acc = np.frombuffer(data, "<f8", 3, off)
    return secs + nsecs * 1e-9, acc.copy(), gyr.copy()


_DATATYPE_NP = {1: "i1", 2: "u1", 3: "i2", 4: "u2", 5: "i4", 6: "u4", 7: "f4", 8: "f8"}


def _parse_pointcloud2(data: bytes):
    """sensor_msgs/PointCloud2 -> (times (N,) f64 absolute, points (N, 3) f64).

    Field discovery is by name: x/y/z plus a per-point time field named
    ``time`` | ``t`` | ``timestamp`` | ``time_stamp`` (absolute f64 in the
    Hilti layout; a relative f32 field is added to the header stamp)."""
    off = 4
    secs, nsecs = struct.unpack_from("<II", data, off)
    stamp = secs + nsecs * 1e-9
    off += 8
    (n,) = struct.unpack_from("<I", data, off)
    off += 4 + n
    height, width = struct.unpack_from("<II", data, off)
    off += 8
    (nf,) = struct.unpack_from("<I", data, off)
    off += 4
    fields = {}
    for _ in range(nf):
        name, off = _read_string(data, off)
        foff, dtype_code, count = struct.unpack_from("<IBI", data, off)
        off += 9
        fields[name] = (foff, dtype_code, count)
    is_bigendian = data[off]
    off += 1
    point_step, row_step = struct.unpack_from("<II", data, off)
    off += 8
    (dlen,) = struct.unpack_from("<I", data, off)
    off += 4
    raw = np.frombuffer(data, np.uint8, dlen, off).reshape(-1, point_step)
    npts = raw.shape[0]
    if is_bigendian:
        raise ValueError("big-endian PointCloud2 not supported")

    def col(name):
        foff, code, _ = fields[name]
        dt = np.dtype("<" + _DATATYPE_NP[code])
        return raw[:, foff : foff + dt.itemsize].copy().view(dt)[:, 0]

    xyz = np.stack([col("x").astype(np.float64),
                    col("y").astype(np.float64),
                    col("z").astype(np.float64)], axis=1)
    tname = next((c for c in ("time", "t", "timestamp", "time_stamp") if c in fields), None)
    if tname is None:
        times = np.full(npts, stamp)
    else:
        tvals = col(tname).astype(np.float64)
        # absolute per-point stamps sit near the header stamp (Hilti layout);
        # otherwise the field holds offsets from the header stamp
        absolute = tvals.size and abs(tvals[0] - stamp) < 10.0
        times = tvals if absolute else stamp + tvals
    order = np.argsort(times, kind="stable")
    return times[order], xyz[order]


def read_bag(
    path: str,
    imu_topic: Optional[str] = None,
    lidar_topic: Optional[str] = None,
) -> Iterator[tuple]:
    """Yield ("imu", t, acc, gyr) and ("scan", times, points_lidar) events in
    file order (rosbag chunks are time-ordered in practice, matching the
    reference's rosbag::View iteration). Topics default to any connection of
    the matching message type."""
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#ROSBAG V2.0"):
            raise ValueError(f"{path}: not a ROS1 bag v2.0 (got {magic[:20]!r})")
        blob = f.read()

    connections = {}  # conn id -> (topic, type)
    for header, data in _records(blob):
        op = header.get("op", b"\x00")[0]
        if op == _OP_CONNECTION:
            conn = struct.unpack("<I", header["conn"])[0]
            chdr = _parse_header(data)
            topic = header.get("topic", b"").decode()
            mtype = chdr.get("type", b"").decode()
            connections[conn] = (topic, mtype)
        elif op == _OP_CHUNK:
            compression = header.get("compression", b"none").decode()
            if compression == "none":
                chunk = data
            elif compression == "bz2":
                chunk = bz2.decompress(data)
            elif compression == "lz4":
                try:
                    import lz4.frame
                except ImportError as e:
                    raise ImportError("bag uses lz4 chunks; optional lz4 package required") from e
                chunk = lz4.frame.decompress(data)
            else:
                raise ValueError(f"unknown chunk compression {compression!r}")
            for h2, d2 in _records(chunk):
                op2 = h2.get("op", b"\x00")[0]
                if op2 == _OP_CONNECTION:
                    conn = struct.unpack("<I", h2["conn"])[0]
                    chdr = _parse_header(d2)
                    connections[conn] = (h2.get("topic", b"").decode(),
                                         chdr.get("type", b"").decode())
                elif op2 == _OP_MESSAGE:
                    conn = struct.unpack("<I", h2["conn"])[0]
                    topic, mtype = connections.get(conn, ("", ""))
                    if mtype == "sensor_msgs/Imu" and (imu_topic is None or topic == imu_topic):
                        yield ("imu", *_parse_imu(d2))
                    elif mtype == "sensor_msgs/PointCloud2" and (
                        lidar_topic is None or topic == lidar_topic
                    ):
                        yield ("scan", *_parse_pointcloud2(d2))


def convert_bag(bag_path: str, out_dir: str, imu_topic=None, lidar_topic=None) -> dict:
    """Convert a bag into the .wcs/imu.npz sequence layout (io/dataset.py)."""
    from wildcat_slam_tpu.io.dataset import save_sequence

    imu, scans = [], []
    for ev in read_bag(bag_path, imu_topic, lidar_topic):
        if ev[0] == "imu":
            imu.append(ev[1:])
        else:
            scans.append((ev[1], ev[2].astype(np.float32)))
    save_sequence(out_dir, imu, scans)
    return {"imu": len(imu), "scans": len(scans)}


# ---------------------------------------------------------------------------
# Writer — enough of the format to round-trip our own reader in tests and to
# package synthetic sequences as bags.
# ---------------------------------------------------------------------------

def _header(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        entry = k.encode() + b"=" + v
        out += struct.pack("<I", len(entry)) + entry
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _ros_time(t: float) -> bytes:
    secs = int(t)
    return struct.pack("<II", secs, int(round((t - secs) * 1e9)))


def _ser_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ser_imu(t: float, acc, gyr) -> bytes:
    out = struct.pack("<I", 0) + _ros_time(t) + _ser_string("imu")
    out += struct.pack("<4d", 0, 0, 0, 1) + struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *gyr) + struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *acc) + struct.pack("<9d", *([0.0] * 9))
    return out


def _ser_pointcloud2(times: np.ndarray, pts: np.ndarray) -> bytes:
    n = len(times)
    point_step = 26  # x,y,z,intensity f32 + time f64 + ring u16 (hilti layout)
    out = struct.pack("<I", 0) + _ros_time(float(times[0]) if n else 0.0) + _ser_string("lidar")
    out += struct.pack("<II", 1, n)
    fdefs = [("x", 0, 7), ("y", 4, 7), ("z", 8, 7), ("intensity", 12, 7), ("time", 16, 8), ("ring", 24, 4)]
    out += struct.pack("<I", len(fdefs))
    for name, foff, code in fdefs:
        out += _ser_string(name) + struct.pack("<IBI", foff, code, 1)
    out += struct.pack("<B", 0)
    out += struct.pack("<II", point_step, point_step * n)
    raw = np.zeros((n, point_step), np.uint8)
    raw[:, 0:12] = np.ascontiguousarray(pts.astype("<f4")).view(np.uint8).reshape(n, 12)
    raw[:, 16:24] = np.ascontiguousarray(times.astype("<f8")).view(np.uint8).reshape(n, 8)
    out += struct.pack("<I", point_step * n) + raw.tobytes()
    out += struct.pack("<B", 1)
    return out


def write_bag(path: str, events, imu_topic="/alphasense/imu", lidar_topic="/hesai/pandar") -> None:
    """events: iterable of ("imu", t, acc, gyr) | ("scan", times, points)."""
    conns = {imu_topic: (0, "sensor_msgs/Imu"), lidar_topic: (1, "sensor_msgs/PointCloud2")}
    chunk = b""
    for topic, (cid, mtype) in conns.items():
        conn_hdr = _header({"topic": topic.encode(), "type": mtype.encode(),
                            "md5sum": b"0" * 32, "message_definition": b""})
        chunk += _record({"op": bytes([_OP_CONNECTION]), "conn": struct.pack("<I", cid),
                          "topic": topic.encode()}, conn_hdr)
    for ev in events:
        if ev[0] == "imu":
            _, t, acc, gyr = ev
            chunk += _record({"op": bytes([_OP_MESSAGE]),
                              "conn": struct.pack("<I", 0), "time": _ros_time(t)},
                             _ser_imu(t, acc, gyr))
        else:
            _, times, pts = ev
            chunk += _record({"op": bytes([_OP_MESSAGE]),
                              "conn": struct.pack("<I", 1),
                              "time": _ros_time(float(times[0]) if len(times) else 0.0)},
                             _ser_pointcloud2(np.asarray(times), np.asarray(pts)))

    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": bytes([_OP_BAG_HEADER]), "index_pos": struct.pack("<Q", 0),
                         "conn_count": struct.pack("<I", len(conns)),
                         "chunk_count": struct.pack("<I", 1)}, b" " * 4096))
        f.write(_record({"op": bytes([_OP_CHUNK]), "compression": b"none",
                         "size": struct.pack("<I", len(chunk))}, chunk))
