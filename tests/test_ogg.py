"""Ogg container codec (ogg.py, RFC 3533) — validated WITHOUT an
independent Ogg implementation: the page CRC table is checked against
a bit-at-a-time implementation of the spec polynomial, roundtrips
cover lacing edge cases (255-multiple packets, packets spanning
pages), page flags and granule rules are asserted per the RFC, and a
FULL corruption sweep proves every single-byte flip anywhere in the
stream is detected or harmless."""

from __future__ import annotations

import numpy as np
import pytest

from canned_yaml_spark import multimodal as mm
from canned_yaml_spark import ogg as O


def _crc_ref(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF \
                if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
    return crc


def test_crc_table_matches_bit_at_a_time():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 26, 300):
        d = bytes(rng.integers(0, 256, n).astype(np.uint8))
        assert O.ogg_crc(d) == _crc_ref(d)


def test_roundtrip_and_flags():
    rng = np.random.default_rng(1)
    pkts = [bytes(rng.integers(0, 256, s).astype(np.uint8))
            for s in (47, 130, 90)]
    buf = O.ogg_encode(pkts, [480, 960, 1440])
    back, granule = O.ogg_packets(buf)
    assert back == pkts and granule == 1440
    [page] = O.ogg_pages(buf)
    assert page["header_type"] == 0x06          # BOS | EOS, one page
    assert page["granule"] == 1440


def test_packet_spanning_pages_and_granule_rule():
    rng = np.random.default_rng(2)
    small = bytes(rng.integers(0, 256, 47).astype(np.uint8))
    big = bytes(rng.integers(0, 256, 255 * 3 + 17).astype(np.uint8))
    tail = bytes(rng.integers(0, 256, 90).astype(np.uint8))
    buf = O.ogg_encode([small, big, tail], [100, 200, 300],
                       max_segs_per_page=2)
    back, granule = O.ogg_packets(buf)
    assert back == [small, big, tail] and granule == 300
    pages = O.ogg_pages(buf)
    # page 0 completes `small` (granule 100) though its LAST segment
    # continues `big`; mid page continues only (-1); last carries EOS
    assert [p["granule"] for p in pages] == [100, -1, 300]
    assert pages[0]["header_type"] == 0x02       # BOS
    assert pages[1]["header_type"] == 0x01       # continued
    assert pages[-1]["header_type"] & 0x04       # EOS


def test_255_multiple_packet_lacing():
    rng = np.random.default_rng(3)
    for n in (255, 510):
        p = bytes(rng.integers(0, 256, n).astype(np.uint8))
        back, _ = O.ogg_packets(O.ogg_encode([p], [5]))
        assert back == [p]


def test_encoder_rejects():
    with pytest.raises(O.OggError):
        O.ogg_encode([], [])
    with pytest.raises(O.OggError):
        O.ogg_encode([b"a", b"b"], [10])
    with pytest.raises(O.OggError):
        O.ogg_encode([b"a", b"b"], [10, 10])     # non-increasing


def test_full_corruption_sweep():
    # the page CRC covers header AND body, so EVERY single-byte flip
    # must either be detected or leave the decoded packets identical
    rng = np.random.default_rng(4)
    pkts = [bytes(rng.integers(0, 256, s).astype(np.uint8))
            for s in (47, 130, 90)]
    buf = O.ogg_encode(pkts, [480, 960, 1440])
    for pos in range(len(buf)):
        c = bytearray(buf)
        c[pos] ^= 0x55
        try:
            back, g = O.ogg_packets(bytes(c))
        except O.OggError:
            continue
        assert back == pkts and g == 1440, pos
    for cut in (3, 20, len(buf) // 2, len(buf) - 1):
        with pytest.raises(O.OggError):
            O.ogg_packets(buf[:cut])


def test_sequence_continuity_enforced():
    rng = np.random.default_rng(5)
    big = bytes(rng.integers(0, 256, 600).astype(np.uint8))
    buf = O.ogg_encode([big, b"x"], [10, 20], max_segs_per_page=1)
    pages = O.ogg_pages(buf)
    assert len(pages) >= 3
    # drop a middle page (a VALID page vanishing): continuity check
    # must catch the seq jump even though every remaining CRC is fine
    import struct
    p1 = pages[1]
    start = buf.find(b"OggS", 4)                 # second page offset
    body_len = sum(p1["lacing"])
    end = start + 27 + len(p1["lacing"]) + body_len
    with pytest.raises(O.OggError):
        O.ogg_pages(buf[:start] + buf[end:])
    del struct


def test_multimodal_corpus_slot():
    for k in (64, 192, 448, 1000064):
        meta, err = mm.decode_media(mm.encode_ogg(k))
        assert err is None
        assert meta == {"width": None, "height": None, "channels": None,
                        "n_frames": mm.ogg_final_granule(k),
                        "mean_luma": None}
    mid, _, buf = mm.media_row(64)
    assert bytes(buf[:4]) == b"OggS"
    meta, err = mm.decode_media(bytes(mm.media_row(320)[2]))  # corrupt
    assert meta is None and err.startswith("undecodable")
