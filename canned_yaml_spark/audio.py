"""Deterministic audio synthesis, codecs (4 real + 2 stubs), and SNR.

The audio decode libraries (libsndfile/ffmpeg/opus) are NOT in this
container, so the remaining entropy-coded codecs (`opus`, `mp3`) are
**clearly-marked deterministic stubs**: each wraps the real PCM16
samples in a magic-tagged container (quantized to simulate lossy
coding, zlib-compressed). The Spark-side plumbing — binary columns,
Arrow batches, vectorized decode, SNR math — is real and is what the
engine exercises; swapping a stub for a real codec changes only this
module.

FOUR codec slots are REAL, not stubs: `ulaw`/`alaw` (below),
`adpcm_ima` (IMA/DVI ADPCM — see its own section; audioop-validated
the same way), and `flac` (spec-conformant RFC 9639 FLAC — rice
coding, fixed + LPC predictors, CRC-8/16 + MD5 verification; its own
module, flac.py). `ulaw` and `alaw` implement ITU-T
G.711 companding (the telephony log-PCM pair, 8 bits/sample) as
vectorized numpy bit arithmetic — segment lookup via searchsorted,
mantissa shifts elementwise. All four mappings (encode+decode × µ/A)
are validated byte-exactly against the stdlib's independent C
implementation (`audioop`) over the FULL domain — every int16 for the
encoders, every byte for the decoders — in tests/test_audio.py, the
same cross-check discipline the WAV container got from stdlib `wave`.
Companded G.711 keeps the synthetic corpus ~37 dB above its own noise
floor, comfortably over the 30 dB payload gate; truncation or byte
damage drops it to -inf (length mismatch) or far below the gate.

Everything is a pure function of its arguments (seeded, no RNG state),
so executors regenerate identical bytes on retry — a requirement for
exactly-once resume semantics.

Reference analog: deep payload equality lifts the reference's equal()
(/root/reference/canner/src/equal.cc:3-34) from YAML node values to
audio payloads; equal.cc's first-element-only bug (SURVEY.md §2.4) is
exactly the class of error the full-signal SNR check avoids.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from canned_yaml_spark import flac

#: container magics for the stub codecs (real formats' magic bytes, so
#: corrupt/garbage payloads are detected the same way real decoders do)
_MAGIC = {
    "pcm_s16le": b"",
    "ulaw": b"",       # raw G.711 µ-law stream, 1 byte/sample (REAL codec)
    "alaw": b"",       # raw G.711 A-law stream, 1 byte/sample (REAL codec)
    "adpcm_ima": b"ADP1",  # IMA/DVI ADPCM, 4 bits/sample (REAL codec)
    "flac": b"fLaC",
    "opus": b"OpusHead",
    "mp3": b"ID3\x04",
}

#: G.711 segment end tables (ITU-T G.711 companding curves; 14-bit
#: biased magnitude for µ-law, 13-bit magnitude for A-law)
_ULAW_BIAS = 0x84
_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF,
                      0x1FFF], dtype=np.int32)
_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF,
                      0xFFF], dtype=np.int32)


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM → G.711 µ-law bytes (vectorized; audioop-exact)."""
    x = np.asarray(pcm, dtype=np.int32) >> 2            # 16 → 14 bit
    mask = np.where(x < 0, 0x7F, 0xFF)
    mag = np.minimum(np.abs(x), 8159) + (_ULAW_BIAS >> 2)
    seg = np.searchsorted(_SEG_UEND, mag)               # first end ≥ mag
    seg_c = np.minimum(seg, 7)
    uval = (seg_c << 4) | ((mag >> (seg_c + 1)) & 0xF)
    uval = np.where(seg >= 8, 0x7F, uval)
    return (uval ^ mask).astype(np.uint8)


def ulaw_decode(data: np.ndarray) -> np.ndarray:
    """G.711 µ-law bytes → int16 PCM (every byte is a valid sample)."""
    u = (~np.asarray(data, dtype=np.uint8)).astype(np.int32) & 0xFF
    t = (((u & 0xF) << 3) + _ULAW_BIAS) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype("<i2")


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM → G.711 A-law bytes (vectorized; audioop-exact)."""
    x = np.asarray(pcm, dtype=np.int32) >> 3            # 16 → 13 bit
    mask = np.where(x >= 0, 0xD5, 0x55)                 # even-bit inversion
    mag = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_SEG_AEND, mag)
    seg_c = np.minimum(seg, 7)
    shift = np.where(seg_c < 2, 1, seg_c)
    aval = (seg_c << 4) | ((mag >> shift) & 0xF)
    aval = np.where(seg >= 8, 0x7F, aval)
    return (aval ^ mask).astype(np.uint8)


def alaw_decode(data: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes → int16 PCM (every byte is a valid sample)."""
    a = (np.asarray(data, dtype=np.uint8).astype(np.int32)) ^ 0x55
    t = (a & 0xF) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype("<i2")

#: bits of quantization applied by the lossy stubs (keeps SNR well
#: above the 30 dB gate for intact payloads, far below it for damage)
_LOSSY_SHIFT = {"opus": 4, "mp3": 3}

SEMITONE = 2.0 ** (1.0 / 12.0)


def has_decoder(codec: str) -> bool:
    """Whether the (stub) codec registry can decode this codec. Unknown
    codecs are enum/referential violations, not payload ones — the
    payload check skips them."""
    return codec in _MAGIC


def synth_pcm(key: int, sr_hz: int, dur_ms: int,
              max_samples: int | None = 4096) -> np.ndarray:
    """Deterministic PCM16 mono signal for a clip key.

    FIXTURES.md table 1: 0.5·sin(2π·f0·t) + 0.3·sin(2π·2f0·t), f0
    varied per row by (key % 32) semitones from 220 Hz. max_samples
    caps the payload for sandbox-scale tables (at production scale
    clips stream from object storage; the validation math is
    length-independent).
    """
    n = int(dur_ms) * int(sr_hz) // 1000
    if max_samples is not None:
        n = min(n, max_samples)
    if n <= 0:
        return np.zeros(0, dtype=np.int16)
    f0 = 220.0 * SEMITONE ** (key % 32)
    t = np.arange(n, dtype=np.float64) / float(sr_hz)
    x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(2 * np.pi * 2 * f0 * t)
    return np.clip(x * 32767.0, -32768, 32767).astype("<i2")


# ---- IMA/DVI ADPCM (ITU/IMA 4-bit adaptive differential PCM) --------
#
# REAL codec, not a stub: the classic 4:1 telephony/WAV compressor — a
# one-tap predictor with an adaptive step size, 4 bits per sample. The
# code loops below are validated against the stdlib's independent C
# implementation (audioop.lin2adpcm/adpcm2lin — same IMA/DVI variant,
# including audioop's arbitrary-initial-state form) in
# tests/test_audio.py. The predictor is sequentially dependent sample
# to sample, so unlike G.711 the inner loop cannot vectorize; it runs
# as a per-clip Python-int loop inside the Arrow batch — the same
# place the framed stubs pay their zlib call. Container: a 9-byte
# header (magic + sample count + the block's initial predictor state,
# exactly what IMA-in-WAV block headers carry — without it every clip
# pays a cold-start transient that costs ~45 dB on smooth signals)
# followed by packed high-nibble-first codes.

_ADPCM_STEP = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
_ADPCM_IDX = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)


def _adpcm_encode_codes(pcm: np.ndarray,
                        valpred: int = 0, index: int = 0) -> list[int]:
    """int16 samples → 4-bit IMA code list from the given predictor
    state (audioop-exact for any state)."""
    out = []
    for val in pcm.tolist():
        diff = val - valpred
        sign = 8 if diff < 0 else 0
        if sign:
            diff = -diff
        step = _ADPCM_STEP[index]
        delta = 0
        vpdiff = step >> 3
        if diff >= step:
            delta = 4
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 2
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 1
            vpdiff += step
        valpred = valpred - vpdiff if sign else valpred + vpdiff
        valpred = max(-32768, min(32767, valpred))
        delta |= sign
        index = max(0, min(88, index + _ADPCM_IDX[delta]))
        out.append(delta)
    return out


def _adpcm_decode_codes(codes, valpred: int = 0,
                        index: int = 0) -> np.ndarray:
    """4-bit IMA codes → int16 samples from the given predictor state
    (audioop-exact for any state)."""
    out = []
    for delta in codes:
        step = _ADPCM_STEP[index]
        vpdiff = step >> 3
        if delta & 4:
            vpdiff += step
        if delta & 2:
            vpdiff += step >> 1
        if delta & 1:
            vpdiff += step >> 2
        valpred = valpred - vpdiff if delta & 8 else valpred + vpdiff
        valpred = max(-32768, min(32767, valpred))
        index = max(0, min(88, index + _ADPCM_IDX[delta]))
        out.append(valpred)
    return np.array(out, dtype="<i2")


def _adpcm_pack(codes: list[int]) -> bytes:
    b = bytearray()
    for i in range(0, len(codes) - 1, 2):
        b.append((codes[i] << 4) | codes[i + 1])
    if len(codes) % 2:
        b.append(codes[-1] << 4)
    return bytes(b)


def _adpcm_unpack(data: bytes, n: int) -> list[int]:
    codes = []
    for byte in data:
        codes.append(byte >> 4)
        codes.append(byte & 0xF)
    return codes[:n]


def encode(pcm: np.ndarray, codec: str) -> bytes:
    """Encode PCM16 → payload bytes under a (stub) codec."""
    raw = np.asarray(pcm, dtype="<i2")
    if codec == "pcm_s16le":
        return raw.tobytes()
    if codec == "ulaw":
        return ulaw_encode(raw).tobytes()
    if codec == "alaw":
        return alaw_encode(raw).tobytes()
    if codec == "adpcm_ima":
        n = int(raw.size)
        valpred0 = int(raw[0]) if n else 0
        hdr = _MAGIC[codec] + struct.pack("<IhB", n, valpred0, 0)
        return hdr + _adpcm_pack(_adpcm_encode_codes(raw, valpred0, 0))
    if codec == "flac":
        # REAL codec (flac.py, RFC 9639): mono/16-bit FLAC stream with
        # fixed predictors (vectorized cumsum restore — the registry's
        # scale default; see flac.py module docstring for the LPC
        # trade). The registry signature carries no sample rate; the
        # STREAMINFO rate is nominal — SNR math is rate-independent.
        return flac.flac_encode(raw)
    if codec in ("opus", "mp3"):
        shift = _LOSSY_SHIFT.get(codec, 0)
        if shift:
            raw = ((raw.astype(np.int32) >> shift) << shift).astype("<i2")
        return _MAGIC[codec] + zlib.compress(raw.tobytes(), level=1)
    raise NotImplementedError(
        f"codec {codec!r}: no encoder in this sandbox (stub registry: "
        f"{sorted(_MAGIC)})")


def decode(data: bytes | bytearray | memoryview, codec: str) -> np.ndarray | None:
    """Decode payload bytes → PCM16, or None when undecodable.

    Returns None (rather than raising) for unknown codecs, bad magic,
    or corrupt streams — the payload check turns None into an ERROR
    violation row.
    """
    if data is None:
        return None
    buf = bytes(data)
    if codec == "pcm_s16le":
        if len(buf) % 2:
            return None
        return np.frombuffer(buf, dtype="<i2")
    if codec == "ulaw":
        return ulaw_decode(np.frombuffer(buf, dtype=np.uint8))
    if codec == "alaw":
        return alaw_decode(np.frombuffer(buf, dtype=np.uint8))
    if codec == "adpcm_ima":
        if len(buf) < 11 or not buf.startswith(_MAGIC[codec]):
            return None
        n, valpred0, index0 = struct.unpack("<IhB", buf[4:11])
        body = buf[11:]
        if index0 > 88 or len(body) != (n + 1) // 2:
            return None          # truncated/padded stream or bad header
        return _adpcm_decode_codes(_adpcm_unpack(body, n),
                                   valpred0, index0)
    if codec == "flac":
        return flac.flac_decode(buf)     # REAL codec: CRC+MD5-verified
    magic = _MAGIC.get(codec)
    if magic is None or not buf.startswith(magic):
        return None
    try:
        raw = zlib.decompress(buf[len(magic):])
    except zlib.error:
        return None
    if len(raw) % 2:
        return None
    return np.frombuffer(raw, dtype="<i2")


def batch_stats(decs: list, clip_thresh: int,
                silence_thresh: int) -> dict[str, np.ndarray]:
    """Per-clip quality metrics over a batch of decoded PCM arrays,
    vectorized the same way payload._batch_snr is: equal-length clips
    stack into ONE int16 matrix per length group, and every metric is
    a row-axis reduction over it (exact int64 accumulation; the only
    floats are the final divisions). Training-data pipelines gate on
    these: clipping → distorted capture, near-zero RMS / high silence
    fraction → dead air, DC offset → broken recording chain.

    Returns arrays aligned with `decs`; rows whose decode failed
    (None) keep n_samples = -1 and NaN metrics (the Spark caller maps
    those to NULLs), empty clips keep n_samples = 0.
    """
    n = len(decs)
    out = {
        "n_samples": np.full(n, -1, dtype=np.int64),
        "peak": np.zeros(n, dtype=np.int64),
        "dc_offset": np.full(n, np.nan),
        "rms_db": np.full(n, np.nan),
        "clip_frac": np.full(n, np.nan),
        "silence_frac": np.full(n, np.nan),
    }
    groups: dict[int, list[int]] = {}
    for i, d in enumerate(decs):
        if d is None:
            continue
        if d.size == 0:
            out["n_samples"][i] = 0
            continue
        groups.setdefault(d.size, []).append(i)
    for size, idx in groups.items():
        d = np.empty((len(idx), size), dtype=np.int16)
        for j, i in enumerate(idx):
            d[j] = decs[i]
        ix = np.asarray(idx)
        a = np.abs(d.astype(np.int32))
        sums = d.sum(axis=1, dtype=np.int64)
        sumsq = np.einsum("ij,ij->i", d, d, dtype=np.int64)
        out["n_samples"][ix] = size
        out["peak"][ix] = a.max(axis=1)
        out["dc_offset"][ix] = sums / size
        rms = np.sqrt(sumsq / size)
        with np.errstate(divide="ignore"):
            db = 20.0 * np.log10(rms / 32768.0)
        out["rms_db"][ix] = np.where(rms > 0, db, np.nan)  # silence: NULL
        out["clip_frac"][ix] = (a >= clip_thresh).sum(axis=1) / size
        out["silence_frac"][ix] = (a <= silence_thresh).sum(axis=1) / size
    return out


def snr_db(ref: np.ndarray, dec: np.ndarray | None) -> float:
    """Signal-to-noise ratio of decoded vs reference PCM, in dB.

    Length mismatch or failed decode → -inf (hard fail). Bit-exact
    match → +inf.
    """
    if dec is None or ref.size != dec.size:
        return float("-inf")
    if ref.size == 0:
        return float("inf")
    r = ref.astype(np.float64)
    n = r - dec.astype(np.float64)
    p_sig = float(np.dot(r, r))
    p_noise = float(np.dot(n, n))
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)
