"""Pure-Python rosbag v2.0 I/O — no ROS, no bagpy.

The reference ingests experiment recordings with ``bagpy`` (prepare.py:173-
199), which drags in a full rospy stack that is absent on TPU hosts. The
bag format itself is tiny: a magic line plus length-prefixed records, each
a {name=value} header block and a data blob (http://wiki.ros.org/Bags/
Format/2.0). This module implements

  - ``BagReader`` / ``read_bag_native``: sequential record scan (indexes are
    ignored — robust to unindexed/crashed bags), 'none', 'bz2' AND 'lz4'
    chunk compression (lz4 via a pure-Python LZ4-frame decoder below — the
    most common `rosbag record` compression in the wild, prepare.py:173-199
    reads it through bagpy), and deserializers for the three message types
    the pipeline uses: geometry_msgs/PoseStamped,
    geometry_msgs/QuaternionStamped, rosgraph_msgs/Log. Output mirrors
    bagpy's flattened-column DataFrames ('pose.position.x', 'quaternion.w',
    'msg', ...) so the rest of the ingestion code (bag.py) is byte-for-byte
    agnostic to the loader.
  - ``BagWriter``: writes spec-compliant v2.0 bags (bag header record
    padded with 0x20 in its DATA section exactly like rosbag's own writer,
    connection records, one chunk — 'none', 'bz2' or 'lz4' — index data
    and chunk info records) so recordings made by the SIL/hardware bridge
    are readable by standard ROS tooling as well as by this reader.
    Byte-level framing is pinned against the published format spec
    (http://wiki.ros.org/Bags/Format/2.0) by tests/test_rosbag_native.py.
"""
from __future__ import annotations

import bz2
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

__all__ = ["BagReader", "BagWriter", "read_bag_native",
           "lz4_frame_decompress", "lz4_frame_compress"]

MAGIC = b"#ROSBAG V2.0\n"

OP_MESSAGE_DATA = 0x02
OP_BAG_HEADER = 0x03
OP_INDEX_DATA = 0x04
OP_CHUNK = 0x05
OP_CHUNK_INFO = 0x06
OP_CONNECTION = 0x07

# Standard ROS md5sums / definitions for the message types the hardware
# loop records (motor_joy_teleop:33-36 publishes QuaternionStamped; Vicon
# publishes PoseStamped; firmware commands are logged via rosout Log).
MSG_TYPES = {
    "geometry_msgs/PoseStamped": "d3812c3cbc69362b77dc0b19b345f8f5",
    "geometry_msgs/QuaternionStamped": "e57f1e547e0e1fd13504588ffc8334e2",
    "rosgraph_msgs/Log": "acffd30cd6b6de30f120938c17c593fb",
}


# ------------------------------------------------------------ lz4 (frame)
#
# roslz4 (the compressor behind `rosbag record --lz4`) writes the public
# LZ4 Frame format: magic 0x184D2204, FLG/BD descriptor, then blocks of
# [4-byte LE size | data] where the size's high bit marks a stored
# (uncompressed) block, terminated by a zero EndMark. Block payloads are
# LZ4 *block* format: sequences of (token, literals, 16-bit offset,
# match). Implemented here in pure Python — no lz4 wheel on TPU hosts.
# Spec: https://github.com/lz4/lz4/blob/dev/doc/lz4_Frame_format.md and
# lz4_Block_format.md; decode parity is pinned by hand-derived spec
# vectors in tests/test_rosbag_native.py.

_LZ4_MAGIC = 0x184D2204


def _lz4_block_decompress(src: bytes, dst: bytearray) -> None:
    """Decode one LZ4 block into ``dst`` (appended). ``dst`` carries the
    full decoded history, so matches that reach into earlier blocks
    (block-dependent frames) resolve correctly."""
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        dst += src[i:i + lit]
        i += lit
        if i >= n:
            break           # last sequence of the block has no match part
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("corrupt lz4 block: zero match offset")
        mlen = token & 15
        if mlen == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(dst) - offset
        if start < 0:
            raise ValueError("corrupt lz4 block: offset before stream start")
        if offset >= mlen:
            dst += dst[start:start + mlen]
        else:               # overlapping match: the pattern repeats
            pattern = bytes(dst[start:])
            reps = (mlen + offset - 1) // offset
            dst += (pattern * reps)[:mlen]


def lz4_frame_decompress(data: bytes) -> bytes:
    """Decode an LZ4 frame (the `rosbag record --lz4` chunk payload)."""
    if len(data) < 7 or struct.unpack_from("<L", data, 0)[0] != _LZ4_MAGIC:
        raise ValueError("not an LZ4 frame (bad magic)")
    flg = data[4]
    if (flg >> 6) != 1:
        raise ValueError(f"unsupported LZ4 frame version {flg >> 6}")
    block_checksum = bool(flg & 0x10)
    content_size = bool(flg & 0x08)
    dict_id = bool(flg & 0x01)
    i = 6                                   # magic + FLG + BD
    if content_size:
        i += 8
    if dict_id:
        i += 4
    i += 1                                  # header checksum byte
    out = bytearray()
    while True:
        (bsize,) = struct.unpack_from("<L", data, i)
        i += 4
        if bsize == 0:                      # EndMark
            break
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        block = data[i:i + bsize]
        i += bsize
        if stored:
            out += block
        else:
            _lz4_block_decompress(block, out)
        if block_checksum:
            i += 4
    return bytes(out)


def lz4_frame_compress(data: bytes) -> bytes:
    """Encode ``data`` as a valid LZ4 frame of stored (uncompressed)
    blocks — every LZ4 decoder (roslz4, the lz4 CLI, this module) reads
    it. Used by BagWriter(compression='lz4'); ratio 1.0 by design (the
    bag stays valid, the chunk plumbing is exercised)."""
    flg = 0x60                              # version 01, block-independent
    bd = 0x70                               # 4 MiB max block size
    # header checksum: (xxh32(FLG+BD) >> 8) & 0xFF — hardcode via the
    # one-shot xxh32 below so external readers accept the frame
    hc = _xxh32(bytes([flg, bd])) >> 8 & 0xFF
    out = bytearray(struct.pack("<L", _LZ4_MAGIC) + bytes([flg, bd, hc]))
    maxb = 4 * 1024 * 1024
    for off in range(0, len(data), maxb):
        block = data[off:off + maxb]
        out += struct.pack("<L", len(block) | 0x80000000) + block
    out += struct.pack("<L", 0)             # EndMark
    return bytes(out)


def _xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (one-shot) — needed only for the LZ4 frame header
    checksum byte. Reference algorithm, 32-bit arithmetic."""
    P1, P2, P3, P4, P5 = (2654435761, 2246822519, 3266489917,
                          668265263, 374761393)
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i <= n - 16:
            for vi, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<L", data, i + 4 * vi)
                v = (v + lane * P2) & M
                v = (rotl(v, 13) * P1) & M
                if vi == 0:
                    v1 = v
                elif vi == 1:
                    v2 = v
                elif vi == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 4:
        (lane,) = struct.unpack_from("<L", data, i)
        h = (h + lane * P3) & M
        h = (rotl(h, 17) * P4) & M
        i += 4
    while i < n:
        h = (h + data[i] * P5) & M
        h = (rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h


# ---------------------------------------------------------------- helpers

def _pack_header(fields: Dict[str, bytes]) -> bytes:
    out = b""
    for name, value in fields.items():
        entry = name.encode() + b"=" + value
        out += struct.pack("<L", len(entry)) + entry
    return out


def _parse_header(buf: bytes) -> Dict[str, bytes]:
    fields = {}
    i = 0
    while i < len(buf):
        (n,) = struct.unpack_from("<L", buf, i)
        i += 4
        entry = buf[i:i + n]
        i += n
        name, _, value = entry.partition(b"=")
        fields[name.decode()] = value
    return fields


def _read_record(buf: bytes, i: int) -> Tuple[Dict[str, bytes], bytes, int]:
    (hlen,) = struct.unpack_from("<L", buf, i)
    header = _parse_header(buf[i + 4:i + 4 + hlen])
    i += 4 + hlen
    (dlen,) = struct.unpack_from("<L", buf, i)
    data = buf[i + 4:i + 4 + dlen]
    return header, data, i + 4 + dlen


def _time_bytes(t: float) -> bytes:
    if t < 0:
        raise ValueError(f"ROS time is unsigned; got negative stamp {t}")
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    if nsecs >= 1_000_000_000:      # carry (e.g. t = 1.9999999999)
        secs += 1
        nsecs -= 1_000_000_000
    return struct.pack("<LL", secs, nsecs)


def _time_from(buf: bytes, off: int = 0) -> float:
    secs, nsecs = struct.unpack_from("<LL", buf, off)
    return secs + nsecs * 1e-9


# -------------------------------------------------- message serialization

def _ser_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<L", len(b)) + b


def _deser_string(buf: bytes, i: int) -> Tuple[str, int]:
    (n,) = struct.unpack_from("<L", buf, i)
    return buf[i + 4:i + 4 + n].decode(errors="replace"), i + 4 + n


def _ser_ros_header(seq: int, t: float, frame_id: str) -> bytes:
    return struct.pack("<L", seq) + _time_bytes(t) + _ser_string(frame_id)


def _deser_ros_header(buf: bytes, i: int):
    (seq,) = struct.unpack_from("<L", buf, i)
    stamp = _time_from(buf, i + 4)
    frame_id, i = _deser_string(buf, i + 12)
    return seq, stamp, frame_id, i


def ser_pose_stamped(seq, t, frame_id, xyz, quat_xyzw) -> bytes:
    return (_ser_ros_header(seq, t, frame_id)
            + struct.pack("<3d", *np.asarray(xyz, np.float64))
            + struct.pack("<4d", *np.asarray(quat_xyzw, np.float64)))


def deser_pose_stamped(buf: bytes) -> dict:
    seq, stamp, frame_id, i = _deser_ros_header(buf, 0)
    x, y, z = struct.unpack_from("<3d", buf, i)
    qx, qy, qz, qw = struct.unpack_from("<4d", buf, i + 24)
    return {"header.seq": seq, "header.stamp": stamp,
            "header.frame_id": frame_id,
            "pose.position.x": x, "pose.position.y": y, "pose.position.z": z,
            "pose.orientation.x": qx, "pose.orientation.y": qy,
            "pose.orientation.z": qz, "pose.orientation.w": qw}


def ser_quaternion_stamped(seq, t, frame_id, quat_xyzw) -> bytes:
    return (_ser_ros_header(seq, t, frame_id)
            + struct.pack("<4d", *np.asarray(quat_xyzw, np.float64)))


def deser_quaternion_stamped(buf: bytes) -> dict:
    seq, stamp, frame_id, i = _deser_ros_header(buf, 0)
    qx, qy, qz, qw = struct.unpack_from("<4d", buf, i)
    return {"header.seq": seq, "header.stamp": stamp,
            "header.frame_id": frame_id,
            "quaternion.x": qx, "quaternion.y": qy,
            "quaternion.z": qz, "quaternion.w": qw}


def ser_log(seq, t, msg: str, name: str = "/motor_control",
            level: int = 2) -> bytes:
    return (_ser_ros_header(seq, t, "")
            + struct.pack("<b", level)
            + _ser_string(name) + _ser_string(msg)
            + _ser_string("") + _ser_string("")      # file, function
            + struct.pack("<L", 0)                   # line
            + struct.pack("<L", 0))                  # topics[] (empty)


def deser_log(buf: bytes) -> dict:
    seq, stamp, _frame, i = _deser_ros_header(buf, 0)
    (level,) = struct.unpack_from("<b", buf, i)
    name, i = _deser_string(buf, i + 1)
    msg, i = _deser_string(buf, i)
    return {"header.seq": seq, "header.stamp": stamp,
            "level": level, "name": name, "msg": msg}


_DESERIALIZERS = {
    "geometry_msgs/PoseStamped": deser_pose_stamped,
    "geometry_msgs/QuaternionStamped": deser_quaternion_stamped,
    "rosgraph_msgs/Log": deser_log,
}


# ------------------------------------------------------------------ reader

class BagReader:
    """Sequential-scan reader: collects every message record, grouped by
    topic, into bagpy-shaped DataFrames indexed by record time ('Time')."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            raw = f.read()
        if not raw.startswith(MAGIC):
            raise ValueError(f"{path}: not a rosbag v2.0 file")
        self._connections: Dict[int, Dict[str, str]] = {}
        self._rows: Dict[str, List[Tuple[float, bytes]]] = {}
        self._scan(raw, len(MAGIC), top_level=True)

    def _scan(self, buf: bytes, i: int, top_level: bool) -> None:
        end = len(buf)
        while i < end:
            header, data, i = _read_record(buf, i)
            op = header.get("op", b"\x00")[0]
            if op == OP_CHUNK:
                comp = header.get("compression", b"none").decode()
                if comp == "bz2":
                    data = bz2.decompress(data)
                elif comp == "lz4":
                    data = lz4_frame_decompress(data)
                elif comp != "none":
                    raise ValueError(f"unsupported chunk compression {comp}")
                self._scan(data, 0, top_level=False)
            elif op == OP_CONNECTION:
                (conn,) = struct.unpack("<L", header["conn"])
                chdr = _parse_header(data)
                self._connections[conn] = {
                    "topic": chdr.get(
                        "topic", header.get("topic", b"")).decode(),
                    "type": chdr.get("type", b"").decode(),
                }
            elif op == OP_MESSAGE_DATA:
                (conn,) = struct.unpack("<L", header["conn"])
                t = _time_from(header["time"])
                info = self._connections.get(conn)
                if info is None:
                    continue  # garbage-tolerant, like the serial reader
                self._rows.setdefault(info["topic"], []).append((t, data))
            # bag header / index / chunk-info records carry no messages

    @property
    def topics(self) -> List[str]:
        return sorted(self._rows)

    def message_type(self, topic: str) -> Optional[str]:
        for info in self._connections.values():
            if info["topic"] == topic:
                return info["type"]
        return None

    def topic_frame(self, topic: str) -> pd.DataFrame:
        """Flattened-column DataFrame for one topic, like bagpy's CSVs:
        a 'Time' column (bag record time) plus per-field columns."""
        mtype = self.message_type(topic)
        deser = _DESERIALIZERS.get(mtype or "")
        if deser is None:
            raise ValueError(f"no deserializer for {topic} ({mtype})")
        rows = []
        for t, blob in self._rows.get(topic, []):
            row = {"Time": t}
            row.update(deser(blob))
            rows.append(row)
        return pd.DataFrame(rows)


def read_bag_native(path: str) -> Dict[str, pd.DataFrame]:
    """All decodable topics of a .bag as {topic: DataFrame}."""
    reader = BagReader(path)
    out = {}
    for topic in reader.topics:
        if reader.message_type(topic) in _DESERIALIZERS:
            out[topic] = reader.topic_frame(topic)
    return out


# ------------------------------------------------------------------ writer

class BagWriter:
    """Spec-compliant rosbag v2.0 writer (single chunk + index).

    Used by the SIL chain and the hardware bridge to record experiments in
    the exact on-disk format the reference pipeline consumed, and by test
    fixtures so bag ingestion is exercised against genuine binary bags.

    compression: 'none' (default), 'bz2', or 'lz4' (stored-block LZ4
    frame) — the chunk compressions `rosbag record` emits."""

    def __init__(self, path: str, compression: str = "none"):
        if compression not in ("none", "bz2", "lz4"):
            raise ValueError(f"unsupported compression {compression!r}")
        self._compression = compression
        self._path = path
        self._conn_ids: Dict[str, int] = {}
        self._conn_records: List[bytes] = []
        # per-connection [(time, offset-in-chunk)] for index records
        self._index: Dict[int, List[Tuple[float, int]]] = {}
        self._chunk = bytearray()
        self._times: List[float] = []
        self._seq: Dict[str, int] = {}
        self._closed = False

    def _connection(self, topic: str, mtype: str) -> int:
        if topic in self._conn_ids:
            return self._conn_ids[topic]
        conn = len(self._conn_ids)
        self._conn_ids[topic] = conn
        chdr = _pack_header({
            "topic": topic.encode(),
            "type": mtype.encode(),
            "md5sum": MSG_TYPES[mtype].encode(),
            "message_definition": b"",
            "callerid": b"/knode_cosserat_tpu",
        })
        rec_hdr = _pack_header({
            "op": bytes([OP_CONNECTION]),
            "conn": struct.pack("<L", conn),
            "topic": topic.encode(),
        })
        rec = (struct.pack("<L", len(rec_hdr)) + rec_hdr
               + struct.pack("<L", len(chdr)) + chdr)
        self._conn_records.append(rec)
        # connection records are also replicated inside the chunk so a
        # sequential scan needs no out-of-chunk state
        self._chunk += rec
        return conn

    def _write_msg(self, topic: str, mtype: str, t: float,
                   payload: bytes) -> None:
        conn = self._connection(topic, mtype)
        hdr = _pack_header({
            "op": bytes([OP_MESSAGE_DATA]),
            "conn": struct.pack("<L", conn),
            "time": _time_bytes(t),
        })
        self._index.setdefault(conn, []).append((t, len(self._chunk)))
        self._chunk += (struct.pack("<L", len(hdr)) + hdr
                        + struct.pack("<L", len(payload)) + payload)
        self._times.append(t)

    def _next_seq(self, topic: str) -> int:
        self._seq[topic] = self._seq.get(topic, 0) + 1
        return self._seq[topic] - 1

    # -- public message writers ------------------------------------------

    def write_pose(self, topic: str, t: float, xyz, quat_xyzw,
                   frame_id: str = "world") -> None:
        self._write_msg(topic, "geometry_msgs/PoseStamped", t,
                        ser_pose_stamped(self._next_seq(topic), t, frame_id,
                                         xyz, quat_xyzw))

    def write_quaternion(self, topic: str, t: float, quat_xyzw,
                         frame_id: str = "") -> None:
        self._write_msg(topic, "geometry_msgs/QuaternionStamped", t,
                        ser_quaternion_stamped(self._next_seq(topic), t,
                                               frame_id, quat_xyzw))

    def write_log(self, t: float, msg: str, topic: str = "/rosout") -> None:
        self._write_msg(topic, "rosgraph_msgs/Log", t,
                        ser_log(self._next_seq(topic), t, msg))

    # -- finalize ----------------------------------------------------------

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        raw = bytes(self._chunk)
        if self._compression == "bz2":
            chunk_data = bz2.compress(raw)
        elif self._compression == "lz4":
            chunk_data = lz4_frame_compress(raw)
        else:
            chunk_data = raw
        chunk_hdr = _pack_header({
            "op": bytes([OP_CHUNK]),
            "compression": self._compression.encode(),
            "size": struct.pack("<L", len(raw)),   # UNcompressed size
        })
        chunk_rec = (struct.pack("<L", len(chunk_hdr)) + chunk_hdr
                     + struct.pack("<L", len(chunk_data)) + chunk_data)

        with open(self._path, "wb") as f:
            f.write(MAGIC)
            # Bag header record padded to exactly 4096 bytes TOTAL, with
            # the 0x20 padding in the DATA section (data_len = pad) —
            # matching rosbag's own _write_file_header_record so standard
            # ROS readers (which validate each length-prefixed header
            # field) accept the file.
            chunk_pos = len(MAGIC) + 4096
            index_pos = chunk_pos + len(chunk_rec) + sum(
                # index data record length per connection
                4 + len(self._idx_hdr(c)) + 4 + 12 * len(rows)
                for c, rows in self._index.items())
            bag_hdr = _pack_header({
                "op": bytes([OP_BAG_HEADER]),
                "index_pos": struct.pack("<Q", index_pos),
                "conn_count": struct.pack("<L", len(self._conn_ids)),
                "chunk_count": struct.pack("<L", 1),
            })
            pad = 4096 - 8 - len(bag_hdr)
            f.write(struct.pack("<L", len(bag_hdr)) + bag_hdr
                    + struct.pack("<L", pad) + b" " * pad)
            f.write(chunk_rec)
            # index data records (one per connection, directly after chunk)
            for conn, rows in self._index.items():
                hdr = self._idx_hdr(conn)
                data = b"".join(_time_bytes(t) + struct.pack("<L", off)
                                for t, off in rows)
                f.write(struct.pack("<L", len(hdr)) + hdr
                        + struct.pack("<L", len(data)) + data)
            # connection records + chunk info at index_pos
            for rec in self._conn_records:
                f.write(rec)
            t0 = min(self._times) if self._times else 0.0
            t1 = max(self._times) if self._times else 0.0
            info_hdr = _pack_header({
                "op": bytes([OP_CHUNK_INFO]),
                "ver": struct.pack("<L", 1),
                "chunk_pos": struct.pack("<Q", chunk_pos),
                "start_time": _time_bytes(t0),
                "end_time": _time_bytes(t1),
                "count": struct.pack("<L", len(self._conn_ids)),
            })
            info_data = b"".join(
                struct.pack("<LL", conn, len(rows))
                for conn, rows in self._index.items())
            f.write(struct.pack("<L", len(info_hdr)) + info_hdr
                    + struct.pack("<L", len(info_data)) + info_data)

    def _idx_hdr(self, conn: int) -> bytes:
        return _pack_header({
            "op": bytes([OP_INDEX_DATA]),
            "ver": struct.pack("<L", 1),
            "conn": struct.pack("<L", conn),
            "count": struct.pack("<L", len(self._index[conn])),
        })

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
