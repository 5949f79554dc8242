"""ISO BMFF (MP4) box-layer codec (mp4.py) — validated WITHOUT an
independent MP4 implementation: box layouts are asserted against
hand-computed offsets, structural lies (samples outside mdat,
stsz/stts disagreement) are constructed explicitly, and every
single-byte corruption must parse to well-formed metadata or fail
cleanly. Sample DECODE is out of scope by design (H.264 needs an
external codec — the declared stub)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from canned_yaml_spark import mp4 as M
from canned_yaml_spark import multimodal as mm


def test_roundtrip_metadata():
    buf = M.mp4_encode([100, 120, 80, 90, 110], width=12, height=10)
    m = M.mp4_meta(buf)
    assert m["width"] == 12 and m["height"] == 10
    assert m["n_frames"] == 5
    assert m["duration_ms"] == 200            # 5 × 40 @ timescale 1000
    assert m["sample_sizes"] == [100, 120, 80, 90, 110]
    m2 = M.mp4_meta(M.mp4_encode([7], width=640, height=480,
                                 timescale=90000, sample_delta=3000))
    assert (m2["width"], m2["height"], m2["n_frames"]) == (640, 480, 1)
    assert m2["duration_ms"] == 33            # round(3000/90000 · 1000)


def test_box_layout_hand_computed():
    # the file must open with the 28-byte ftyp box (8 header + 'isom'
    # + minor version + 3 compatible brands) followed by mdat whose
    # payload starts at the offset stco declares
    buf = M.mp4_encode([10, 20], width=4, height=4)
    assert struct.unpack(">I", buf[0:4])[0] == 28
    assert buf[4:8] == b"ftyp" and buf[8:12] == b"isom"
    assert buf[32:36] == b"mdat"
    mdat_payload = 36
    stco_at = buf.rfind(b"stco")
    first_off = struct.unpack(">I", buf[stco_at + 12: stco_at + 16])[0]
    assert first_off == mdat_payload
    # sample 0 bytes are the deterministic fill (j·19 % 256)
    want = bytes((np.arange(10, dtype=np.int64) * 19 % 256)
                 .astype(np.uint8))
    assert buf[mdat_payload: mdat_payload + 10] == want


def test_structural_lies_rejected():
    buf = M.mp4_encode([50, 50], width=8, height=8)
    # shrink mdat's declared size → later boxes overrun / samples
    # land outside mdat: either way, a clean Mp4Error
    ftyp_len = struct.unpack(">I", buf[0:4])[0]
    bad = bytearray(buf)
    old = struct.unpack(">I", bad[ftyp_len: ftyp_len + 4])[0]
    bad[ftyp_len: ftyp_len + 4] = struct.pack(">I", old - 40)
    with pytest.raises(M.Mp4Error):
        M.mp4_meta(bytes(bad))
    # stsz count vs stts frames disagreement (stsz payload layout:
    # version/flags at +4, uniform size at +8, count at +12)
    stsz_at = buf.rfind(b"stsz")
    bad = bytearray(buf)
    bad[stsz_at + 12: stsz_at + 16] = struct.pack(">I", 3)
    with pytest.raises(M.Mp4Error):
        M.mp4_meta(bytes(bad))
    for cut in (10, 60, len(buf) // 2, len(buf) - 4):
        with pytest.raises(M.Mp4Error):
            M.mp4_meta(buf[:cut])
    with pytest.raises(M.Mp4Error):
        M.mp4_meta(b"")
    with pytest.raises(M.Mp4Error):
        M.mp4_encode([], width=4, height=4)
    with pytest.raises(M.Mp4Error):
        M.mp4_encode([0], width=4, height=4)
    with pytest.raises(M.Mp4Error):
        M.mp4_encode([5], width=0, height=4)


def test_corruption_sweep_never_crashes():
    buf = M.mp4_encode([60, 70, 80], width=6, height=4)
    for pos in range(0, len(buf) - 1, 2):
        c = bytearray(buf)
        c[pos] ^= 0x55
        try:
            m = M.mp4_meta(bytes(c))
        except (M.Mp4Error, struct.error):
            continue
        # accepted parses must be well-formed (a flipped declared
        # value IS different metadata — that is not a parse failure)
        assert m["width"] > 0 and m["n_frames"] > 0


def test_demux_samples():
    sizes = [100, 120, 80]
    buf = M.mp4_encode(sizes, width=8, height=8)
    samples = M.mp4_samples(buf)
    assert [len(s) for s in samples] == sizes
    for i, s in enumerate(samples):
        want = bytes(((np.arange(len(s), dtype=np.int64) * 19 + i * 3)
                      % 256).astype(np.uint8))
        assert s == want
    with pytest.raises(M.Mp4Error):
        M.mp4_samples(buf[: len(buf) // 2])


def test_frame_sample_demuxes_mp4(spark):
    # frame_sample over MP4 = demux without decode: every Nth CODED
    # sample, byte-exact; a structurally-lying container yields none
    rows = [("p0", 0, bytearray(mm.encode_mp4(32))),
            ("p1", 1, bytearray(mm.encode_mp4(96)[:100]))]  # truncated
    df = spark.createDataFrame(rows,
                               "media_id string, part_id int, media binary")
    got = {(r.media_id, r.frame_idx): bytes(r.frame)
           for r in mm.frame_sample(df, every=2).collect()}
    assert set(got) == {("p0", 0), ("p0", 2), ("p0", 4)}
    want = M.mp4_samples(mm.encode_mp4(32))
    for i in (0, 2, 4):
        assert got[("p0", i)] == want[i]
        assert len(want[i]) == 60 + (32 + i) % 40


def test_multimodal_corpus_slot():
    for k in (32, 96, 160, 1000032):
        meta, err = mm.decode_media(mm.encode_mp4(k))
        assert err is None
        assert meta == {"width": mm.MP4_W, "height": mm.MP4_H,
                        "channels": None, "n_frames": mm.MP4_F,
                        "mean_luma": None}
    mid, _, buf = mm.media_row(32)
    assert bytes(buf[4:8]) == b"ftyp"
    meta, err = mm.decode_media(bytes(mm.media_row(160)[2]))  # corrupt
    assert meta is None and err.startswith("undecodable")


def _bump_box_size(buf: bytearray, box_start: int, delta: int) -> None:
    old = struct.unpack(">I", buf[box_start: box_start + 4])[0]
    buf[box_start: box_start + 4] = struct.pack(">I", old + delta)


def test_mdhd_v1_duration_is_64_bit():
    # ADVICE r5: a version-1 mdhd stores duration as u64; the parser
    # must read '>IQ', not '>II' (which lands on the HIGH half and
    # reports ~0 for any real file). Surgery: swap the encoder's v0
    # mdhd (24-byte payload) for a v1 one (36-byte payload) carrying
    # the same timescale/duration, bumping every ancestor box size.
    buf = bytearray(M.mp4_encode([100, 120], width=12, height=10))
    mh = buf.find(b"mdhd") - 4
    # v0 payload layout after the 8-byte header: ver/flags 4, c 4,
    # m 4, timescale 4 (at +20), duration 4 (at +24), lang+q 4 (+28)
    ts, dur = struct.unpack(">II", buf[mh + 20: mh + 28])
    lang_q = bytes(buf[mh + 28: mh + 32])
    v1_payload = (struct.pack(">B", 1) + b"\x00" * 3
                  + struct.pack(">QQIQ", 0, 0, ts, dur) + lang_q)
    new_mdhd = struct.pack(">I", 8 + len(v1_payload)) + b"mdhd" + v1_payload
    delta = len(new_mdhd) - (struct.unpack(">I", buf[mh: mh + 4])[0])
    for tag in (b"moov", b"trak", b"mdia"):
        _bump_box_size(buf, buf.find(tag) - 4, delta)
    patched = bytes(buf[:mh]) + new_mdhd + bytes(
        buf[mh + struct.unpack(">I", buf[mh: mh + 4])[0]:])
    m = M.mp4_meta(patched)
    assert m["duration_ms"] == 80            # 2 x 40 @ timescale 1000
    assert m["n_frames"] == 2


def test_stts_truncated_count_is_clean_error():
    # ADVICE r5: a corrupt stts entry count must not walk into sibling
    # box bytes — it must fail with Mp4Error, not accumulate garbage
    buf = bytearray(M.mp4_encode([50, 50, 50], width=8, height=8))
    tt = buf.find(b"stts") - 4
    buf[tt + 12: tt + 16] = struct.pack(">I", 1000)   # entry count lie
    with pytest.raises(M.Mp4Error):
        M.mp4_meta(bytes(buf))


def test_short_mvhd_payload_is_clean_error():
    # crafted ftyp+mdat+moov/mvhd whose mvhd payload is shorter than
    # the fixed field offsets previously escaped as struct.error
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    mdat = struct.pack(">I", 9) + b"mdat" + b"x"
    mvhd = struct.pack(">I", 12) + b"mvhd" + b"\x00" * 4
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    bad = ftyp + mdat + moov
    with pytest.raises((M.Mp4Error, struct.error)):
        M.mp4_meta(bad)
    # ...but the Spark-facing frame_sample contract is "no rows", so
    # the multimodal branch must swallow it (exercised below)


def test_frame_sample_survives_malformed_mp4_and_vid1(spark):
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    mdat = struct.pack(">I", 9) + b"mdat" + b"x"
    mvhd = struct.pack(">I", 12) + b"mvhd" + b"\x00" * 4
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    bad_mp4 = ftyp + mdat + moov
    short_vid1 = b"VID1\x01\x00\x02"         # 7-byte stub payload
    good = mm.encode_mp4(32)
    rows = [("bad", 0, bytearray(bad_mp4)),
            ("short", 1, bytearray(short_vid1)),
            ("good", 2, bytearray(good))]
    df = spark.createDataFrame(rows, "media_id string, part_id int, media binary")
    out = mm.frame_sample(df, every=1).collect()
    ids = {r.media_id for r in out}
    assert "bad" not in ids and "short" not in ids
    assert "good" in ids
