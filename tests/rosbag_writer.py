"""Minimal ROS1 bag 2.0 writer — test fixture for the bag reader."""

from __future__ import annotations

import bz2
import struct

import numpy as np


def _header(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        entry = k.encode() + b"=" + v
        out += struct.pack("<I", len(entry)) + entry
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _msg_header(t: float, frame: str) -> bytes:
    sec = int(t)
    nsec = int((t - sec) * 1e9)
    return struct.pack("<III", 0, sec, nsec) + _string(frame)


def encode_pointcloud2(t: float, xyz: np.ndarray,
                       ring: np.ndarray | None = None,
                       intensity: np.ndarray | None = None) -> bytes:
    n = xyz.shape[0]
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1)]
    step = 12
    if intensity is not None:
        fields.append(("intensity", step, 7, 1))
        step += 4
    if ring is not None:
        fields.append(("ring", step, 4, 1))
        step += 2
    raw = np.zeros((n, step), np.uint8)
    raw[:, 0:12] = xyz.astype(np.float32).view(np.uint8).reshape(n, 12)
    off = 12
    if intensity is not None:
        raw[:, off:off + 4] = intensity.astype(np.float32)[:, None].view(np.uint8)
        off += 4
    if ring is not None:
        raw[:, off:off + 2] = ring.astype(np.uint16)[:, None].view(np.uint8)
        off += 2

    out = _msg_header(t, "velodyne")
    out += struct.pack("<II", 1, n)              # height, width
    out += struct.pack("<I", len(fields))
    for name, foff, dt, cnt in fields:
        out += _string(name) + struct.pack("<IBI", foff, dt, cnt)
    out += struct.pack("<B", 0)                  # is_bigendian
    out += struct.pack("<II", step, step * n)    # point_step, row_step
    body = raw.tobytes()
    out += struct.pack("<I", len(body)) + body
    out += struct.pack("<B", 1)                  # is_dense
    return out


def encode_imu(t: float, quat, gyro, acc) -> bytes:
    out = _msg_header(t, "imu")
    out += struct.pack("<4d", *quat)
    out += struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *gyro)
    out += struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *acc)
    out += struct.pack("<9d", *([0.0] * 9))
    return out


def write_bag(path: str, messages, compression: str = "none") -> None:
    """messages: list of (topic, msg_type, t, raw_bytes)."""
    topics = {}
    chunk = b""
    for topic, mtype, t, raw in messages:
        if topic not in topics:
            cid = len(topics)
            topics[topic] = cid
            chunk += _record(
                {"op": b"\x07", "conn": struct.pack("<I", cid),
                 "topic": topic.encode()},
                _header({"topic": topic.encode(), "type": mtype.encode(),
                         "md5sum": b"0" * 32, "message_definition": b""}))
        cid = topics[topic]
        sec = int(t)
        nsec = int((t - sec) * 1e9)
        chunk += _record(
            {"op": b"\x02", "conn": struct.pack("<I", cid),
             "time": struct.pack("<II", sec, nsec)}, raw)

    if compression == "bz2":
        payload = bz2.compress(chunk)
    else:
        payload = chunk
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                         "conn_count": struct.pack("<I", len(topics)),
                         "chunk_count": struct.pack("<I", 1)}, b""))
        f.write(_record({"op": b"\x05",
                         "compression": compression.encode(),
                         "size": struct.pack("<I", len(chunk))}, payload))
