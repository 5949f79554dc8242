"""Real ISO BMFF (MP4) container codec — box layer only, pure struct.

The ISO base media file format (ISO/IEC 14496-12, the public spec MP4
builds on) is a pure container: a tree of length-prefixed boxes whose
metadata (dimensions, timescale, duration, sample table) is fully
parseable without touching the codec bitstream inside. That split is
exactly how a large-scale pipeline treats video at 100 TB: walk the
container for validation/metadata, never transcode. This module
implements that layer for real:

- writer: `ftyp` (isom), `mdat` carrying opaque sample bytes, `moov`
  with `mvhd` (timescale/duration), `trak`/`tkhd` (16.16 fixed-point
  width/height), `mdia`/`mdhd`/`hdlr`(vide), `minf`/`vmhd`/`dinf`/
  `stbl` with `stsd` (one avc1-shaped entry), `stts` (uniform
  deltas), `stsc`, `stsz` (per-sample sizes), `stco` (real chunk
  offset into mdat) — every box a spec-conformant length-tagged
  structure, offsets computed, not faked;
- parser: recursive box walk with size validation (32-bit sizes;
  size==1/largesize and size==0/to-EOF accepted on the way down),
  extracts width/height from `tkhd`, frame count + duration from
  `stts`/`mdhd`, per-sample sizes from `stsz`, and VERIFIES that
  `stco`+`stsz` land every sample inside `mdat` — a truncated or
  lying container fails, which is what the validation engine needs.

SAMPLE DATA stays opaque: decoding the H.264/H.265 bitstream needs an
external codec (declared stub, multimodal._DECODERS note). Metadata
mapping therefore reports width/height/n_frames and leaves
channels/mean_luma NULL — a parser that cannot know a value must say
so, not guess.

Scale posture: the box walk is a handful of struct reads per payload
(no per-pixel work at all); it runs inside Arrow batches via
multimodal.decode_media.

Validation without an independent MP4 implementation: box layouts are
asserted byte-exact against hand-computed offsets for a tiny file,
roundtrips cover metadata across shapes, every single-byte corruption
of the moov region must decode to the same metadata or fail cleanly,
and sample-table/mdat consistency violations are constructed
explicitly.
"""

from __future__ import annotations

import struct

import numpy as np


class Mp4Error(ValueError):
    """Malformed / truncated / inconsistent container (decode → None)."""


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">B3s", version,
                                 flags.to_bytes(3, "big")) + payload)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)


def mp4_encode(sample_sizes, width: int, height: int,
               timescale: int = 1000, sample_delta: int = 40) -> bytes:
    """Opaque video samples → minimal conformant ISO BMFF file. Sample
    i carries `sample_sizes[i]` deterministic bytes ((j·19 + i·3) %
    256); one chunk, `stco` pointing at the real mdat payload offset."""
    sizes = [int(s) for s in sample_sizes]
    if not sizes or any(s <= 0 for s in sizes):
        raise Mp4Error("need at least one sample of positive size")
    if not (0 < width < 0x8000 and 0 < height < 0x8000):
        raise Mp4Error(f"bad dimensions {width}x{height}")
    n = len(sizes)
    duration = n * sample_delta

    samples = b"".join(
        bytes(((np.arange(s, dtype=np.int64) * 19 + i * 3) % 256)
              .astype(np.uint8)) for i, s in enumerate(sizes))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isomiso2mp41")
    mdat = _box(b"mdat", samples)
    chunk_offset = len(ftyp) + 8            # mdat payload start

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">ihh", 0x10000, 0x100, 0) + b"\x00" * 8
        + _MATRIX + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0,
                                            duration)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + _MATRIX
                 + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale,
                                            duration, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                 + b"cys\x00")
    # stsd: one avc1-shaped sample entry; the codec config inside is
    # opaque by design (sample DECODE is the declared external stub)
    entry = (struct.pack(">I", 86 + 8) + b"avc1" + b"\x00" * 6
             + struct.pack(">H", 1) + b"\x00" * 16
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x480000, 0x480000)
             + struct.pack(">I", 0) + struct.pack(">H", 1)
             + b"\x00" * 32 + struct.pack(">Hh", 0x18, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", s) for s in sizes))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1)
                               + _full(b"url ", 0, 1, b"")))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ------------------------------------------------------------- parser
def _walk(buf: bytes, start: int, end: int):
    """Yield (tag, payload_start, payload_end) for each box in
    [start, end); validates sizes (1 → 64-bit largesize, 0 → to-end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise Mp4Error("truncated box header")
        size = struct.unpack(">I", buf[pos: pos + 4])[0]
        tag = buf[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4Error("truncated largesize")
            size = struct.unpack(">Q", buf[pos + 8: pos + 16])[0]
            body = pos + 16
            if size < 16:
                raise Mp4Error(f"bad largesize {size}")
        elif size == 0:
            size = end - pos
        elif size < 8:
            raise Mp4Error(f"bad box size {size} for {tag!r}")
        if pos + size > end:
            raise Mp4Error(f"box {tag!r} overruns container")
        yield tag, body, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, tag: bytes
          ) -> tuple[int, int]:
    for t, a, b in _walk(buf, start, end):
        if t == tag:
            return a, b
    raise Mp4Error(f"missing {tag!r} box")


def mp4_meta(buf: bytes) -> dict:
    """Container metadata: width/height (tkhd), n_frames (stts),
    duration_ms (mdhd), sample sizes verified against mdat bounds.
    Raises Mp4Error on any structural lie."""
    b = bytes(buf)
    if len(b) < 16 or b[4:8] != b"ftyp":
        raise Mp4Error("missing ftyp")
    mdat_span = None
    moov_span = None
    for tag, a, e in _walk(b, 0, len(b)):
        if tag == b"mdat":
            mdat_span = (a, e)
        elif tag == b"moov":
            moov_span = (a, e)
    if moov_span is None or mdat_span is None:
        raise Mp4Error("missing moov/mdat")

    mv_a, mv_e = _find(b, *moov_span, b"mvhd")
    ver = b[mv_a]
    # mvhd v0: creation/modification 4+4, then timescale+duration
    off = mv_a + 4 + (16 if ver == 1 else 8)
    timescale = struct.unpack(">I", b[off: off + 4])[0]
    if timescale == 0:
        raise Mp4Error("zero timescale")

    tr_a, tr_e = _find(b, *moov_span, b"trak")
    tk_a, tk_e = _find(b, tr_a, tr_e, b"tkhd")
    # tkhd v0 payload: ver/flags 4, c/m/track/res/dur 20, res 8,
    # layer/alt/vol/res 8, matrix 36, then width/height 16.16
    wh_off = tk_a + (4 + 32 + 8 + 8 + 36 if b[tk_a] == 1
                     else 4 + 20 + 8 + 8 + 36)
    if wh_off + 8 > tk_e:
        raise Mp4Error("tkhd too short")
    width = struct.unpack(">I", b[wh_off: wh_off + 4])[0] >> 16
    height = struct.unpack(">I", b[wh_off + 4: wh_off + 8])[0] >> 16
    if width == 0 or height == 0:
        raise Mp4Error("zero track dimensions")

    md_a, md_e = _find(b, tk_e, tr_e, b"mdia")
    mh_a, mh_e = _find(b, md_a, md_e, b"mdhd")
    # mdhd v1: creation/modification are u64, duration is u64
    # (ADVICE r5: '>II' on a v1 box read only duration's high half)
    if b[mh_a] == 1:
        mh_off = mh_a + 4 + 16
        if mh_off + 12 > mh_e:
            raise Mp4Error("mdhd too short")
        m_timescale, m_duration = struct.unpack(">IQ",
                                                b[mh_off: mh_off + 12])
    else:
        mh_off = mh_a + 4 + 8
        if mh_off + 8 > mh_e:
            raise Mp4Error("mdhd too short")
        m_timescale, m_duration = struct.unpack(">II",
                                                b[mh_off: mh_off + 8])
    if m_timescale == 0:
        raise Mp4Error("zero media timescale")

    mi_a, mi_e = _find(b, md_a, md_e, b"minf")
    st_a, st_e = _find(b, mi_a, mi_e, b"stbl")
    tt_a, tt_e = _find(b, st_a, st_e, b"stts")
    if tt_a + 8 > tt_e:
        raise Mp4Error("stts too short")
    n_entries = struct.unpack(">I", b[tt_a + 4: tt_a + 8])[0]
    # bound the entry walk by the stts box's own end (ADVICE r5: a
    # corrupt count otherwise walks into sibling box bytes)
    if tt_a + 8 + 8 * n_entries > tt_e:
        raise Mp4Error("stts table truncated")
    n_frames = 0
    for i in range(n_entries):
        cnt, _delta = struct.unpack(">II",
                                    b[tt_a + 8 + 8 * i:
                                      tt_a + 16 + 8 * i])
        n_frames += cnt
    if n_frames == 0:
        raise Mp4Error("stts declares no samples")

    sz_a, sz_e = _find(b, st_a, st_e, b"stsz")
    uniform, count = struct.unpack(">II", b[sz_a + 4: sz_a + 12])
    if count != n_frames:
        raise Mp4Error(f"stsz count {count} != stts frames {n_frames}")
    if uniform:
        sizes = [uniform] * count
    else:
        if sz_a + 12 + 4 * count > sz_e:
            raise Mp4Error("stsz table truncated")
        sizes = list(struct.unpack(f">{count}I",
                                   b[sz_a + 12: sz_a + 12 + 4 * count]))
    co_a, _ = _find(b, st_a, st_e, b"stco")
    n_chunks = struct.unpack(">I", b[co_a + 4: co_a + 8])[0]
    if n_chunks < 1:
        raise Mp4Error("stco declares no chunks")
    first_off = struct.unpack(">I", b[co_a + 8: co_a + 12])[0]
    # consistency: all samples of the (single-chunk) layout must land
    # inside mdat — the lie a truncated/corrupt file tells
    if not (mdat_span[0] <= first_off
            and first_off + sum(sizes) <= mdat_span[1]):
        raise Mp4Error(
            f"samples [{first_off}, {first_off + sum(sizes)}) outside "
            f"mdat [{mdat_span[0]}, {mdat_span[1]})")

    return {"width": int(width), "height": int(height),
            "n_frames": int(n_frames),
            "duration_ms": int(round(m_duration * 1000 / m_timescale)),
            "sample_sizes": sizes,
            "_first_sample_off": int(first_off)}


def mp4_samples(buf: bytes) -> list[bytes]:
    """Demux WITHOUT decode: the coded sample byte ranges, straight
    from stsz/stco (single-chunk layout, consecutive samples — the
    layout mp4_encode writes and mp4_meta verified against mdat).
    This is the training-pipeline primitive: hand each coded sample to
    whatever consumes it, never transcode in the validation pass."""
    b = bytes(buf)
    m = mp4_meta(b)
    out = []
    pos = m["_first_sample_off"]
    for s in m["sample_sizes"]:
        out.append(b[pos: pos + s])
        pos += s
    return out
