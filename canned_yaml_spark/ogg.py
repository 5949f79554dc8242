"""Real Ogg container codec (RFC 3533) — page layer, pure numpy/stdlib.

Like ISO BMFF (mp4.py), Ogg is a pure container: the page framing —
capture pattern, lacing, granule positions, and a page CRC — is fully
specified in a public RFC and parseable without touching the codec
bitstream the pages carry. A validation engine gets real value from
exactly this layer: every page carries a CRC-32 over its own bytes,
so bit rot anywhere in the stream is DETECTED, not guessed at (the
same capability FLAC's frame CRCs added over the zlib stub).

- writer: packets → pages with correct 255-lacing, continuation
  flags for packets spanning pages, BOS/EOS flags, monotone granule
  positions, per-page CRC;
- parser: page walk verifying capture pattern, version 0, lacing
  arithmetic, page-sequence continuity per stream serial, and EVERY
  page CRC; reassembles packets across page boundaries; reports
  page/packet counts and the final granule position (the sample-count
  claim the container itself makes).

The Ogg page CRC is the direct (non-reflected) CRC-32 with polynomial
0x04C11DB7, zero initial value, and no final XOR, computed with the
crc field zeroed — per RFC 3533 §4 and the reference libogg
implementation's framing notes. It is table-driven here and verified
in tests against an independent bit-at-a-time implementation.

Codec payloads (opus/vorbis bitstreams) remain declared stubs —
psychoacoustic decoders genuinely need external libraries, so the
media registry reports channels/mean_luma as NULL for Ogg rows and
n_frames as the container's own final-granule claim.

Scale posture: the page walk is a few struct reads plus one CRC pass
per page; runs inside Arrow batches via multimodal.decode_media.
"""

from __future__ import annotations

import struct

import numpy as np


class OggError(ValueError):
    """Malformed / truncated / CRC-failing stream (decode → None)."""


def _make_table() -> np.ndarray:
    tab = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = (((r << 1) ^ 0x04C11DB7) if r & 0x80000000
                 else (r << 1)) & 0xFFFFFFFF
        tab[i] = r
    return tab


_CRC_TABLE = _make_table()


def ogg_crc(data: bytes) -> int:
    """Direct CRC-32, poly 0x04C11DB7, init 0, no final xor (RFC 3533)."""
    crc = 0
    tab = _CRC_TABLE
    for b in data:
        crc = ((crc << 8) ^ int(tab[((crc >> 24) & 0xFF) ^ b])) \
            & 0xFFFFFFFF
    return crc


def _page(header_type: int, granule: int, serial: int, seq: int,
          segments: list[bytes]) -> bytes:
    if len(segments) > 255:
        raise OggError("more than 255 segments in one page")
    lacing = bytes(len(s) for s in segments)
    body = b"".join(segments)
    head = (b"OggS" + bytes([0, header_type])
            + struct.pack("<qIII", granule, serial, seq, 0)
            + bytes([len(segments)]) + lacing)
    crc = ogg_crc(head + body)
    head = head[:22] + struct.pack("<I", crc) + head[26:]
    return head + body


def ogg_encode(packets, granules, serial: int = 0x1234,
               max_segs_per_page: int = 255) -> bytes:
    """Packets (list of bytes) + per-packet granule positions → a
    spec-conformant one-stream Ogg. Packets are laced into 255-byte
    segments; a packet whose lacing exceeds the page budget continues
    onto the next page with the continuation flag, granule -1 on pages
    that end no packet. First page carries BOS, last EOS."""
    packets = [bytes(p) for p in packets]
    granules = [int(g) for g in granules]
    if not packets or len(packets) != len(granules):
        raise OggError("need packets with one granule each")
    if any(b <= a for a, b in zip(granules, granules[1:])):
        raise OggError("granule positions must be strictly increasing")

    # lace every packet: 255-byte segments, final segment < 255
    # (a 255-multiple packet gets a trailing 0 lacing value)
    laced = []                              # (packet_idx, segment)
    for i, p in enumerate(packets):
        off = 0
        while True:
            seg = p[off: off + 255]
            laced.append((i, seg))
            off += 255
            if len(seg) < 255:
                break

    out = bytearray()
    seq = 0
    pos = 0
    prev_ended_mid_packet = False
    while pos < len(laced):
        take = laced[pos: pos + max_segs_per_page]
        pos += len(take)
        continued = 0x01 if prev_ended_mid_packet else 0x00
        bos = 0x02 if seq == 0 else 0
        # granule = position of the LAST packet completed anywhere on
        # this page (-1 when every segment continues, RFC 3533 §6);
        # a segment < 255 bytes is a packet's final segment
        completed = [i for i, s in take if len(s) < 255]
        granule = granules[completed[-1]] if completed else -1
        ends_packet = len(take[-1][1]) < 255
        eos = 0x04 if pos >= len(laced) else 0
        out += _page(continued | bos | eos, granule, serial, seq,
                     [s for _, s in take])
        seq += 1
        prev_ended_mid_packet = not ends_packet
    return bytes(out)


def ogg_pages(buf: bytes) -> list[dict]:
    """Validated page list: capture pattern, version 0, lacing
    arithmetic, CRC of EVERY page, and per-serial sequence
    continuity. Raises OggError on any violation."""
    b = bytes(buf)
    if b[:4] != b"OggS":
        raise OggError("missing OggS capture pattern")
    pages = []
    pos = 0
    expected_seq: dict[int, int] = {}
    while pos < len(b):
        if b[pos: pos + 4] != b"OggS":
            raise OggError(f"capture pattern lost at byte {pos}")
        if pos + 27 > len(b):
            raise OggError("truncated page header")
        version, htype = b[pos + 4], b[pos + 5]
        if version != 0:
            raise OggError(f"unsupported Ogg version {version}")
        granule, serial, seq, crc = struct.unpack(
            "<qIII", b[pos + 6: pos + 26])
        n_segs = b[pos + 26]
        lace_end = pos + 27 + n_segs
        if lace_end > len(b):
            raise OggError("truncated lacing table")
        lacing = b[pos + 27: lace_end]
        body_len = sum(lacing)
        end = lace_end + body_len
        if end > len(b):
            raise OggError("page body overruns buffer")
        zeroed = b[pos: pos + 22] + b"\x00\x00\x00\x00" \
            + b[pos + 26: end]
        if ogg_crc(zeroed) != crc:
            raise OggError(f"page {seq} CRC mismatch")
        want = expected_seq.get(serial)
        if want is not None and seq != want:
            raise OggError(f"page sequence jump {want} → {seq} "
                           f"(serial {serial})")
        expected_seq[serial] = seq + 1
        pages.append({"granule": granule, "serial": serial,
                      "seq": seq, "header_type": htype,
                      "lacing": list(lacing),
                      "body": b[lace_end: end]})
        pos = end
    if not pages:
        raise OggError("no pages")
    return pages


def ogg_packets(buf: bytes) -> tuple[list[bytes], int]:
    """(reassembled packets, final granule position) — packets are
    stitched across page boundaries via the lacing rule (a 255-byte
    segment continues, < 255 ends)."""
    pages = ogg_pages(buf)
    packets = []
    cur = bytearray()
    final_granule = 0
    for pg in pages:
        off = 0
        for lace in pg["lacing"]:
            cur += pg["body"][off: off + lace]
            off += lace
            if lace < 255:
                packets.append(bytes(cur))
                cur = bytearray()
        if pg["granule"] >= 0:
            final_granule = pg["granule"]
    if cur:
        raise OggError("stream ends mid-packet")
    return packets, final_granule
