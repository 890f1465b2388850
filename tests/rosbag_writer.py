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


# ---------------------------------------------------------------------------
# Adversarial encodings (round-4 io hardening): real-world bags have sparse
# strided point layouts, float64 coordinates, vendor extra fields, multiple
# chunks with index records between them, repeated connection records, and
# multiple connections per topic.
# ---------------------------------------------------------------------------

def encode_pointcloud2_adversarial(
        t: float, xyz: np.ndarray, ring: np.ndarray | None = None,
        intensity: np.ndarray | None = None, *,
        base_offset: int = 0, tail_pad: int = 0,
        coord_dtype=np.float32, reverse_fields: bool = False,
        extra_field: bool = True, organized_rows: int = 1,
        coord_count: int = 1) -> bytes:
    """PointCloud2 with a hostile field layout: coordinates at a nonzero
    base offset, padding bytes between/after fields (sparse point_step),
    float64 coordinates, an unknown vendor field, field list in reverse
    order, organized (height>1) shape, and count>1 coordinate fields."""
    n = xyz.shape[0]
    cdt = np.dtype(coord_dtype)
    cw = cdt.itemsize
    code = {4: 7, 8: 8}[cw]
    fields = []
    off = base_offset
    for i, name in enumerate(("x", "y", "z")):
        fields.append((name, off, code, coord_count))
        off += cw * coord_count
    if extra_field:
        fields.append(("timestamp_ns", off, 8, 1))   # vendor field, float64
        off += 8
    if intensity is not None:
        fields.append(("intensity", off, 7, 1))
        off += 4
    if ring is not None:
        fields.append(("ring", off, 4, 1))
        off += 2
    step = off + tail_pad
    raw = np.frombuffer(np.random.default_rng(0).bytes(n * step),
                        np.uint8).reshape(n, step).copy()
    for (name, foff, _, cnt), col in zip(fields[:3], range(3)):
        raw[:, foff:foff + cw] = xyz[:, col].astype(cdt)[:, None].view(np.uint8)
        if cnt > 1:  # duplicate elements beyond the first
            for c in range(1, cnt):
                raw[:, foff + c * cw: foff + (c + 1) * cw] = \
                    raw[:, foff:foff + cw]
    fi = 3
    if extra_field:
        foff = fields[fi][1]
        raw[:, foff:foff + 8] = np.full(n, 1.5e18)[:, None].view(np.uint8)
        fi += 1
    if intensity is not None:
        foff = fields[fi][1]
        raw[:, foff:foff + 4] = intensity.astype(np.float32)[:, None].view(np.uint8)
        fi += 1
    if ring is not None:
        foff = fields[fi][1]
        raw[:, foff:foff + 2] = ring.astype(np.uint16)[:, None].view(np.uint8)

    if reverse_fields:
        fields = fields[::-1]
    assert n % organized_rows == 0
    out = _msg_header(t, "velodyne")
    out += struct.pack("<II", organized_rows, n // organized_rows)
    out += struct.pack("<I", len(fields))
    for name, foff, dt, cnt in fields:
        out += _string(name) + struct.pack("<IBI", foff, dt, cnt)
    out += struct.pack("<B", 0)
    out += struct.pack("<II", step, step * (n // organized_rows))
    body = raw.tobytes()
    out += struct.pack("<I", len(body)) + body
    out += struct.pack("<B", 1)
    return out


def write_bag_adversarial(path: str, messages, compression: str = "none",
                          chunk_size: int = 2,
                          conns_every_chunk: bool = False,
                          index_between_chunks: bool = True,
                          duplicate_connections: bool = False) -> None:
    """Multi-chunk bag with index/chunk-info records interleaved between
    chunks, connection records only in the first chunk (or repeated in
    every chunk), and optionally two connection ids for the same topic
    (alternating messages between them)."""
    topics: dict[str, list[int]] = {}
    next_cid = [0]

    def conn_record(topic: str, cid: int) -> bytes:
        return _record(
            {"op": b"\x07", "conn": struct.pack("<I", cid),
             "topic": topic.encode()},
            _header({"topic": topic.encode(),
                     "type": b"sensor_msgs/PointCloud2"
                     if "points" in topic else b"sensor_msgs/Imu",
                     "md5sum": b"0" * 32, "message_definition": b""}))

    # assign connection ids up front
    for topic, mtype, t, raw in messages:
        if topic not in topics:
            cids = [next_cid[0]]
            next_cid[0] += 1
            if duplicate_connections:
                cids.append(next_cid[0])
                next_cid[0] += 1
            topics[topic] = cids

    conn_records = b"".join(
        conn_record(topic, cid)
        for topic, cids in topics.items() for cid in cids)

    chunks = []
    for i in range(0, len(messages), chunk_size):
        chunk = b""
        if i == 0 or conns_every_chunk:
            chunk += conn_records
        for k, (topic, mtype, t, raw) in enumerate(messages[i:i + chunk_size]):
            cids = topics[topic]
            cid = cids[(i + k) % len(cids)]
            sec = int(t)
            nsec = int((t - sec) * 1e9)
            chunk += _record(
                {"op": b"\x02", "conn": struct.pack("<I", cid),
                 "time": struct.pack("<II", sec, nsec)}, raw)
        chunks.append(chunk)

    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                         "conn_count": struct.pack("<I", next_cid[0]),
                         "chunk_count": struct.pack("<I", len(chunks))}, b""))
        for chunk in chunks:
            payload = bz2.compress(chunk) if compression == "bz2" else chunk
            f.write(_record({"op": b"\x05",
                             "compression": compression.encode(),
                             "size": struct.pack("<I", len(chunk))}, payload))
            if index_between_chunks:
                # op=0x04 index-data + op=0x06 chunk-info records the reader
                # must skip over
                f.write(_record({"op": b"\x04", "ver": struct.pack("<I", 1),
                                 "conn": struct.pack("<I", 0),
                                 "count": struct.pack("<I", 0)}, b""))
                f.write(_record({"op": b"\x06", "ver": struct.pack("<I", 1),
                                 "chunk_pos": struct.pack("<Q", 0),
                                 "count": struct.pack("<I", 0)}, b"\x00" * 8))
