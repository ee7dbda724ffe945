"""Pure-Python rosbag v2.0 I/O: round-trip, ingestion parity with the CSV
path, and CLI `prepare` on a genuine binary .bag — closing the reference's
bag-ingestion chain (prepare.py:173-297) without bagpy/ROS installed."""
import numpy as np
import pandas as pd
import pytest

from knode_cosserat_tpu.realworld.bag import read_bag, read_topic_csvs
from knode_cosserat_tpu.realworld.rosbag_io import (BagReader, BagWriter,
                                                    read_bag_native)

from test_realworld_e2e import _write_synthetic_csvs

POSE_TOPICS = {
    "base": "/vicon/continuum_base/pose",
    "link0": "/vicon/continuum_0/pose",
    "link1": "/vicon/continuum_1/pose",
    "link2": "/vicon/continuum_2/pose",
    "link3": "/vicon/continuum_3/pose",
}


def test_bag_roundtrip(tmp_path):
    path = str(tmp_path / "rt.bag")
    with BagWriter(path) as w:
        for i in range(5):
            t = 10.0 + 0.1 * i
            w.write_pose("/vicon/continuum_base/pose", t,
                         [0.1 * i, -0.2, 0.3], [0.0, 0.0, 0.0, 1.0])
            w.write_quaternion("/tension", t, [800.0 + i, 900.0, 1000.0,
                                               1100.0])
            w.write_log(t, f"Serial Command: {800 + i} 900 1000 1100")

    # file magic + spec-required padded bag header
    raw = open(path, "rb").read()
    assert raw.startswith(b"#ROSBAG V2.0\n")

    tables = read_bag_native(path)
    assert set(tables) == {"/vicon/continuum_base/pose", "/tension",
                           "/rosout"}
    pose = tables["/vicon/continuum_base/pose"]
    np.testing.assert_allclose(pose["pose.position.x"], 0.1 * np.arange(5))
    np.testing.assert_allclose(pose["Time"], 10.0 + 0.1 * np.arange(5),
                               atol=1e-9)
    ten = tables["/tension"]
    np.testing.assert_allclose(ten["quaternion.x"], 800.0 + np.arange(5))
    logs = tables["/rosout"]
    assert logs["msg"].iloc[2] == "Serial Command: 802 900 1000 1100"

    reader = BagReader(path)
    assert reader.message_type("/tension") == \
        "geometry_msgs/QuaternionStamped"


def _csvs_to_bag(csv_dir, bag_path):
    """Re-encode a bagpy-style CSV directory as a genuine binary .bag."""
    with BagWriter(str(bag_path)) as w:
        for name, topic in POSE_TOPICS.items():
            fn = topic.strip("/").replace("/", "-") + ".csv"
            df = pd.read_csv(csv_dir / fn)
            for _, r in df.iterrows():
                w.write_pose(topic, r["Time"],
                             [r["pose.position.x"], r["pose.position.y"],
                              r["pose.position.z"]],
                             [r["pose.orientation.x"],
                              r["pose.orientation.y"],
                              r["pose.orientation.z"],
                              r["pose.orientation.w"]])
        ten = pd.read_csv(csv_dir / "tension.csv")
        for _, r in ten.iterrows():
            w.write_quaternion("/tension", r["Time"],
                               [r["quaternion.x"], r["quaternion.y"],
                                r["quaternion.z"], r["quaternion.w"]])
        logs = pd.read_csv(csv_dir / "rosout.csv")
        for _, r in logs.iterrows():
            w.write_log(r["Time"], r["msg"])


def test_read_bag_matches_csv_ingestion(tmp_path):
    csv_dir = tmp_path / "exp"
    csv_dir.mkdir()
    p, controls, traj = _write_synthetic_csvs(csv_dir, T=20)
    bag_path = tmp_path / "exp.bag"
    _csvs_to_bag(csv_dir, bag_path)

    # bagpy must be absent in this environment -> native reader path
    with pytest.raises(ImportError):
        import bagpy  # noqa: F401

    from_csv = read_topic_csvs(str(csv_dir), float(p.del_t), "exp")
    from_bag = read_bag(str(bag_path), float(p.del_t))

    np.testing.assert_allclose(from_bag["t"], from_csv["t"], atol=1e-12)
    np.testing.assert_allclose(from_bag["controls"], from_csv["controls"],
                               atol=1e-9)
    np.testing.assert_allclose(from_bag["interpolated"],
                               from_csv["interpolated"], atol=1e-9)
    for a, b in zip(from_bag["positions"], from_csv["positions"]):
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_sil_records_genuine_bag(tmp_path):
    """The full software-in-the-loop hardware chain recorded as a genuine
    rosbag — teleop -> C++ firmware PID -> plant -> `rosbag record` format
    -> read_bag ingestion (reference chain SURVEY.md section 3.5)."""
    from knode_cosserat_tpu import apply_mod
    from knode_cosserat_tpu.hw import JoyState, export_bag, \
        run_sil_experiment

    joy_step = JoyState(axes=(0, 0, 1.0, 0, 0, 0.0),
                        buttons=(0, 1, 0, 0, 0, 0))
    # non-commensurate firmware period: real telemetry never ties exactly
    # with the solver grid (phase-locked ties make ZOH knife-edge at the
    # float/nanosecond level, which is an artifact, not a behavior)
    vs = run_sil_experiment(joy_step, settle=0.3, tail=1.0, dt=0.0021)
    bag_path = str(tmp_path / "sil_step.bag")
    truth = export_bag(vs, bag_path)

    p = apply_mod(None)
    data = read_bag(bag_path, float(p.del_t))
    n = min(len(data["controls"]), len(truth["controls"]))
    assert n > 5
    # Bag round-trip is lossless: ingested tensions equal ZOH of the
    # recorded telemetry on the ingestion's own grid, exactly. (Comparing
    # against `truth` elementwise is knife-edge: its ZOH grid starts at the
    # first telemetry time, not the trimmed origin, and grid points tie
    # with telemetry sample times to float rounding.)
    from knode_cosserat_tpu.realworld.bag import (grams_to_newtons,
                                                  interpolate_zoh)
    tel_t = np.array([t for t, _, _ in vs.telemetry_log])
    tel_g = np.array([r for _, r, _ in vs.telemetry_log])
    rel_t = tel_t - truth["ts"][0]
    exp = np.stack([
        grams_to_newtons(interpolate_zoh(data["t"], rel_t, tel_g[:, i]))
        for i in range(4)], axis=1)
    np.testing.assert_allclose(data["controls"], exp[:len(data["controls"])],
                               atol=1e-9)
    # ingested mocap tracks the ground-truth rollout
    interp = data["interpolated"]
    m = min(len(interp), len(truth["traj"]))
    tip_err = np.abs(interp[:m, :3, 9] - truth["traj"][:m, :3, 9]).max()
    assert tip_err < 5e-3, tip_err


def test_checked_in_bag_fixture_ingests():
    """The checked-in binary .bag fixture (scripts/gen_sil_fixture.py)
    parses and yields a full ingestion dict."""
    import os
    from knode_cosserat_tpu import apply_mod
    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "sil_step_1100.bag")
    p = apply_mod(None)
    data = read_bag(fix, float(p.del_t))
    assert len(data["t"]) > 50
    assert data["controls"].shape[1] == 4
    assert np.isfinite(data["interpolated"]).all()
    # step experiment: T2/T3 rise toward the 1100 g setpoint (~10.8 N)
    assert data["controls"][-1, 1] > 9.0


def test_cli_prepare_on_binary_bag(tmp_path, capsys):
    csv_dir = tmp_path / "exp3"
    csv_dir.mkdir()
    _write_synthetic_csvs(csv_dir, T=12)
    bag_path = tmp_path / "exp3.bag"
    _csvs_to_bag(csv_dir, bag_path)

    from knode_cosserat_tpu.cli import main
    out_dir = tmp_path / "datas"
    main(["prepare", str(bag_path), "--out_dir", str(out_dir)])
    captured = capsys.readouterr().out
    assert "DTW Distance XYZ" in captured
    data = np.load(out_dir / "exp3.bag.npz")
    assert data["traj"].shape[2] == 50 and np.isfinite(data["traj"]).all()


def test_lz4_block_spec_vector():
    """Hand-derived LZ4 block-format vector (lz4_Block_format.md): token
    lit=4/match=12 (offset 4, overlapping copy) then a 5-literal tail —
    the decoder is checked against the published spec, not against our own
    compressor."""
    from knode_cosserat_tpu.realworld.rosbag_io import _lz4_block_decompress

    # seq1: token 0x48 (4 literals, matchlen 8+4=12), literals "abcd",
    #       offset 4 -> copies "abcd" three times (overlap)
    # seq2: token 0x50 (5 literals, end of block), literals "xyz12"
    block = b"\x48abcd\x04\x00\x50xyz12"
    out = bytearray()
    _lz4_block_decompress(block, out)
    assert bytes(out) == b"abcd" + b"abcd" * 3 + b"xyz12"

    # extended literal/match lengths: lit=15+3=18, match=15+0+4=19, off=1
    block2 = (b"\xff\x03" + b"A" * 18 + b"\x01\x00\x00"
              + b"\x50tail!")
    out2 = bytearray()
    _lz4_block_decompress(block2, out2)
    assert bytes(out2) == b"A" * 18 + b"A" * 19 + b"tail!"


def test_lz4_frame_spec_vector_and_roundtrip():
    """A hand-assembled LZ4 frame (magic, FLG/BD, compressed block,
    EndMark) decodes per the frame spec; the stored-block compressor
    round-trips arbitrary bytes."""
    import struct

    from knode_cosserat_tpu.realworld.rosbag_io import (
        lz4_frame_compress, lz4_frame_decompress)

    block = b"\x48abcd\x04\x00\x50xyz12"
    frame = (struct.pack("<L", 0x184D2204) + bytes([0x60, 0x40, 0x82])
             + struct.pack("<L", len(block)) + block
             + struct.pack("<L", 0))
    assert lz4_frame_decompress(frame) == b"abcdabcdabcdabcdxyz12"

    payload = bytes(range(256)) * 41
    assert lz4_frame_decompress(lz4_frame_compress(payload)) == payload
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"nope")


@pytest.mark.parametrize("compression", ["none", "bz2", "lz4"])
def test_bag_compressed_chunks_roundtrip(tmp_path, compression):
    """BagReader ingests every chunk compression `rosbag record` emits —
    the reference's bagpy path reads them transparently
    (prepare.py:173-199)."""
    path = str(tmp_path / f"c_{compression}.bag")
    with BagWriter(path, compression=compression) as w:
        for i in range(4):
            w.write_quaternion("/tension", 5.0 + i, [1.0 + i, 2, 3, 4])
    tables = read_bag_native(path)
    np.testing.assert_allclose(tables["/tension"]["quaternion.x"],
                               1.0 + np.arange(4))


def test_writer_framing_matches_rosbag_spec(tmp_path):
    """Byte-level check of BagWriter output against the published format
    (http://wiki.ros.org/Bags/Format/2.0 + rosbag's own writer): the bag
    header RECORD is exactly 4096 bytes with the 0x20 padding in the DATA
    section (header_len == true header length, data_len == pad), so
    standard ROS readers that validate length-prefixed header fields
    accept the file. (Advisor r2: the old writer put the pad inside the
    header section.)"""
    import struct

    path = str(tmp_path / "spec.bag")
    with BagWriter(path) as w:
        w.write_quaternion("/tension", 1.0, [1, 2, 3, 4])
    raw = open(path, "rb").read()
    magic = b"#ROSBAG V2.0\n"
    assert raw.startswith(magic)
    i = len(magic)
    (hlen,) = struct.unpack_from("<L", raw, i)
    header = raw[i + 4:i + 4 + hlen]
    # every header field must parse as length-prefixed name=value
    j, fields = 0, {}
    while j < len(header):
        (n,) = struct.unpack_from("<L", header, j)
        entry = header[j + 4:j + 4 + n]
        name, _, value = entry.partition(b"=")
        fields[name.decode()] = value
        j += 4 + n
    assert j == len(header)            # no trailing garbage in the header
    assert fields["op"] == bytes([0x03])
    (dlen,) = struct.unpack_from("<L", raw, i + 4 + hlen)
    pad = raw[i + 8 + hlen:i + 8 + hlen + dlen]
    assert pad == b" " * dlen          # 0x20 padding in the DATA section
    assert 4 + hlen + 4 + dlen == 4096  # record exactly 4096 bytes
    # index_pos points at the post-chunk region inside the file
    (index_pos,) = struct.unpack("<Q", fields["index_pos"])
    assert len(magic) + 4096 < index_pos <= len(raw)
    # the chunk record starts right after the 4096-byte bag header record
    (chlen,) = struct.unpack_from("<L", raw, len(magic) + 4096)
    chdr = raw[len(magic) + 4100:len(magic) + 4100 + chlen]
    assert b"op=\x05" in chdr
    # and the whole file still round-trips through the reader
    tables = read_bag_native(path)
    assert list(tables) == ["/tension"]


def test_reader_parses_externally_constructed_bag():
    """BagReader vs a bag built field-by-field from the format spec in
    THIS test (independent byte layout, not BagWriter) — reader and
    writer are no longer each other's only oracle."""
    import struct

    def hdr(d):
        out = b""
        for k, v in d.items():
            e = k.encode() + b"=" + v
            out += struct.pack("<L", len(e)) + e
        return out

    def rec(h, d=b""):
        return (struct.pack("<L", len(h)) + h
                + struct.pack("<L", len(d)) + d)

    # connection record (conn header in the data section per spec)
    conn_hdr = hdr({"op": b"\x07", "conn": struct.pack("<L", 0),
                    "topic": b"/tension"})
    conn_data = hdr({"topic": b"/tension",
                     "type": b"geometry_msgs/QuaternionStamped",
                     "md5sum": b"e57f1e547e0e1fd13504588ffc8334e2",
                     "message_definition": b""})
    # QuaternionStamped payload: Header(seq, stamp, frame_id) + 4 doubles
    payload = (struct.pack("<L", 7) + struct.pack("<LL", 12, 500000000)
               + struct.pack("<L", 0)
               + struct.pack("<4d", 9.0, 8.0, 7.0, 6.0))
    msg_hdr = hdr({"op": b"\x02", "conn": struct.pack("<L", 0),
                   "time": struct.pack("<LL", 12, 500000000)})
    chunk_payload = rec(conn_hdr, conn_data) + rec(msg_hdr, payload)
    chunk_hdr = hdr({"op": b"\x05", "compression": b"none",
                     "size": struct.pack("<L", len(chunk_payload))})
    bag_hdr = hdr({"op": b"\x03",
                   "index_pos": struct.pack("<Q", 0),
                   "conn_count": struct.pack("<L", 1),
                   "chunk_count": struct.pack("<L", 1)})
    pad = 4096 - 8 - len(bag_hdr)
    blob = (b"#ROSBAG V2.0\n" + rec(bag_hdr, b" " * pad)
            + rec(chunk_hdr, chunk_payload))

    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".bag", delete=False) as f:
        f.write(blob)
        path = f.name
    tables = read_bag_native(path)
    row = tables["/tension"].iloc[0]
    assert row["quaternion.x"] == 9.0 and row["quaternion.w"] == 6.0
    assert abs(row["Time"] - 12.5) < 1e-9
    assert abs(row["header.stamp"] - 12.5) < 1e-9


def test_time_encoding_edge_cases(tmp_path):
    """Negative stamps rejected with a clear error; nanosecond rounding
    carries into seconds (no spec-invalid nsecs == 1e9)."""
    import struct

    from knode_cosserat_tpu.realworld.rosbag_io import (_time_bytes,
                                                        _time_from)
    with pytest.raises(ValueError, match="unsigned"):
        _time_bytes(-0.5)
    secs, nsecs = struct.unpack("<LL", _time_bytes(1.9999999999))
    assert (secs, nsecs) == (2, 0)
    assert abs(_time_from(_time_bytes(123.456789)) - 123.456789) < 1e-9

    w = BagWriter(str(tmp_path / "neg.bag"))
    with pytest.raises(ValueError):
        w.write_pose("/vicon/continuum_base/pose", -1.0,
                     [0, 0, 0], [0, 0, 0, 1])
