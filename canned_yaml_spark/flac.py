"""Real FLAC codec (RFC 9639 subset) — pure numpy + stdlib, no deps.

The `flac` slot in the audio codec registry was a zlib stub through
round 4; this module replaces it with a spec-conformant Free Lossless
Audio Codec implementation built from the PUBLIC format specification
(RFC 9639, IETF, Dec 2024). Scope: mono, 16-bit streams — exactly the
registry's PCM model (audio.py) — with the full coding toolbox inside
that shape:

- STREAMINFO metadata block with the spec's MD5 of the unencoded
  samples (verified on decode — whole-stream integrity, stronger than
  the per-frame CRCs alone);
- frames with fixed blocking strategy, UTF-8-style coded frame
  numbers, header CRC-8 (poly 0x07) and frame CRC-16 (poly 0x8005),
  both verified on decode;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, and LPC orders
  1-32 (decode always; encode opt-in, see below), with wasted-bits
  detection/restore;
- rice-coded residuals: both coding methods (4- and 5-bit
  parameters), any partition order, escape (unencoded) partitions.

Scale posture — why the ENCODER defaults to fixed predictors only:
restoring a FIXED subframe is an o-fold integer integration, which
vectorizes as a cumsum cascade (`_fixed_restore` — zero per-sample
Python); restoring an LPC subframe is an inherently sequential
integer IIR (each sample needs the shifted dot product of the
previous `order` RECONSTRUCTED samples) that no numpy primitive
expresses. At 10^12 rows the decode path must stay vectorized, so the
codec-registry default (`use_lpc=False`) keeps every emitted stream
cumsum-restorable; `use_lpc=True` is available where ratio beats
throughput and is exercised by tests. Rice decode itself IS
vectorized despite being a variable-length code: the bit positions of
all set bits are extracted once (`np.flatnonzero`), each code's
terminator is found by a precomputed jump table over that array, and
all quotients/remainders then resolve as batch gathers
(`_read_rice_block`) — ~50-100x over a per-sample bit loop.

Validation without an independent FLAC implementation in this
container (no flac/ffmpeg/soundfile — dated probe in ROADMAP.md):
CRC polynomials are pinned to published check values, a minimal
stream is hand-assembled bit-by-bit in tests/test_flac.py and decoded
against its paper derivation, encode∘decode identity is
property-tested across signal families and lengths, every subframe
type / coding method / partition order is asserted present via
`frame_info`, and STREAMINFO MD5 uses stdlib hashlib (independent).

Reference analog: like the WAV/RIFF and G.711/ADPCM slots, this
lifts the reference's byte-level payload equality (canner/src/
equal.cc:3-34) to a real interchange format: the validation engine
can now prove SNR over payloads a real archival pipeline would store.
"""

from __future__ import annotations

import hashlib

import numpy as np

MAGIC = b"fLaC"


class FlacError(ValueError):
    """Malformed / unsupported / truncated stream (decode → None)."""


# ------------------------------------------------------------- CRCs
def _crc_table(poly: int, width: int) -> np.ndarray:
    top, mask = 1 << (width - 1), (1 << width) - 1
    tbl = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if (r & top) else (r << 1)
        tbl[b] = r & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)      # x^8 + x^2 + x + 1 (frame header)
_CRC16_TBL = _crc_table(0x8005, 16)  # x^16 + x^15 + x^2 + 1 (frame)

# Positional-contribution tables for one-gather CRC over a whole
# message. Both FLAC CRCs are init-0 / non-reflected / no xor-out, i.e.
# GF(2)-LINEAR in the message bits, so
#     crc(msg) = XOR_i  T[len-1-i][msg[i]]
# where T[p][b] is the crc of byte b followed by p zero bytes. T grows
# lazily (doubling) up to _CRC_POS_MAX positions; longer messages (not
# produced by this encoder's frame sizes) fall back to the byte loop.
# Equivalence with the loop is property-tested in tests/test_flac.py.
_CRC_POS_MAX = 1 << 14
_CRC16_POS = _CRC16_TBL.astype(np.uint16).reshape(1, 256)
_CRC8_POS = _CRC8_TBL.astype(np.uint8).reshape(1, 256)


def _grow_pos_tables(n: int) -> None:
    global _CRC16_POS, _CRC8_POS
    cur = _CRC16_POS.shape[0]
    new = cur
    while new < n:
        new *= 2
    t16 = np.empty((new, 256), dtype=np.uint16)
    t16[:cur] = _CRC16_POS
    t8 = np.empty((new, 256), dtype=np.uint8)
    t8[:cur] = _CRC8_POS
    for p in range(cur, new):
        c = t16[p - 1]
        t16[p] = (_CRC16_TBL[(c >> 8) & 0xFF].astype(np.uint16)
                  ^ ((c << 8) & 0xFFFF).astype(np.uint16))
        t8[p] = _CRC8_TBL[t8[p - 1]].astype(np.uint8)
    _CRC16_POS, _CRC8_POS = t16, t8


def crc8(data: bytes) -> int:
    n = len(data)
    if n == 0:
        return 0
    if n <= _CRC_POS_MAX:
        if n > _CRC8_POS.shape[0]:
            _grow_pos_tables(n)
        a = np.frombuffer(data, dtype=np.uint8)
        return int(np.bitwise_xor.reduce(
            _CRC8_POS[np.arange(n - 1, -1, -1), a]))
    c = 0
    for b in data:
        c = int(_CRC8_TBL[c ^ b])
    return c


def crc16(data: bytes) -> int:
    n = len(data)
    if n == 0:
        return 0
    if n <= _CRC_POS_MAX:
        if n > _CRC16_POS.shape[0]:
            _grow_pos_tables(n)
        a = np.frombuffer(data, dtype=np.uint8)
        return int(np.bitwise_xor.reduce(
            _CRC16_POS[np.arange(n - 1, -1, -1), a]))
    c = 0
    for b in data:
        c = int(_CRC16_TBL[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------- coded frame number
def _coded_number_encode(v: int) -> bytes:
    """UTF-8-style variable-length number (RFC 9639 §9.1.5; extends
    UTF-8 to 36 bits with a 7-byte 0xFE form)."""
    if v < 0x80:
        return bytes([v])
    caps = {2: 11, 3: 16, 4: 21, 5: 26, 6: 31, 7: 36}
    for nb in range(2, 8):
        if v < (1 << caps[nb]):
            break
    else:
        raise FlacError(f"coded number too large: {v}")
    lead = ((0xFF << (8 - nb)) & 0xFF) | (v >> (6 * (nb - 1)))
    out = [lead]
    for i in range(nb - 2, -1, -1):
        out.append(0x80 | ((v >> (6 * i)) & 0x3F))
    return bytes(out)


def _coded_number_decode(br: "_BitReader") -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nb = 8 - (b0 ^ 0xFF).bit_length()   # count of leading 1 bits
    if nb < 2 or nb > 7:
        raise FlacError("bad coded-number lead byte")
    v = b0 & ((1 << (7 - nb)) - 1) if nb < 7 else 0
    for _ in range(nb - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise FlacError("bad coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# ----------------------------------------------------------- bit I/O
class _BitWriter:
    """MSB-first bit accumulator; bulk appends take numpy bit arrays
    (np.packbits) so rice/verbatim bodies never loop per sample."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0          # < 2**nbits
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)          # q zeros then the terminating 1

    def write_bits_array(self, arr: np.ndarray) -> None:
        """Append a 0/1 uint8 bit array in one packbits pass."""
        if self.nbits:
            head = np.array([(self.acc >> (self.nbits - 1 - i)) & 1
                             for i in range(self.nbits)], dtype=np.uint8)
            arr = np.concatenate([head, arr])
            self.acc = 0
            self.nbits = 0
        rem = arr.size % 8
        body, tail = (arr[:arr.size - rem], arr[arr.size - rem:]) \
            if rem else (arr, None)
        if body.size:
            self.buf += np.packbits(body).tobytes()
        if rem:
            v = 0
            for b in tail:
                v = (v << 1) | int(b)
            self.acc, self.nbits = v, rem

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over one np.unpackbits pass of the buffer.

    `ones` (positions of all set bits) + per-parameter jump tables
    make unary scans and whole rice partitions O(1)-per-code numpy
    gathers instead of bit loops — the decode-side half of the scale
    posture in the module docstring."""

    def __init__(self, buf: bytes) -> None:
        self.raw = buf
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits).astype(np.int64)
        self.pos = 0
        self._jumps: dict[int, np.ndarray] = {}
        self._jump_pow_cache: dict[int, list[np.ndarray]] = {}

    def read(self, n: int) -> int:
        # pure-int fast path over the raw byte buffer: header fields
        # are dozens of tiny reads per frame, and a numpy slice +
        # packbits per read cost ~8us each where this is ~0.3us.
        pos = self.pos
        if pos + n > self.bits.size:
            raise FlacError("truncated stream")
        if n == 0:
            return 0
        self.pos = pos + n
        first = pos >> 3
        last = (pos + n - 1) >> 3
        chunk = int.from_bytes(self.raw[first:last + 1], "big")
        return (chunk >> (((last + 1) << 3) - pos - n)) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        j = int(np.searchsorted(self.ones, self.pos))
        if j >= self.ones.size:
            raise FlacError("truncated unary code")
        p = int(self.ones[j])
        q = p - self.pos
        self.pos = p + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def _jump(self, k: int) -> np.ndarray:
        """jump[j] = index into `ones` of the first set bit at/after
        ones[j] + 1 + k (i.e. the next rice terminator candidate after
        skipping this code's k remainder bits)."""
        j = self._jumps.get(k)
        if j is None:
            j = np.searchsorted(self.ones, self.ones + 1 + k)
            self._jumps[k] = j
        return j

    def _jump_pows(self, k: int) -> list[np.ndarray]:
        """Doubling tables for _jump(k): pows[s][j] = where index j
        lands after 2^s jumps (clipped to the sentinel n_ones, which
        absorbs: once past the end, always past the end)."""
        pows = self._jump_pow_cache.get(k)
        if pows is None:
            n_ones = self.ones.size
            j1 = np.minimum(self._jump(k), n_ones)
            base = np.empty(n_ones + 1, dtype=np.int64)
            base[:n_ones] = j1
            base[n_ones] = n_ones            # sentinel fixed point
            pows = [base]
            self._jump_pow_cache[k] = pows
        return pows

    def read_rice_block(self, m: int, k: int) -> np.ndarray:
        """m rice(k) residuals as int64, vectorized (see class doc)."""
        if m == 0:
            return np.zeros(0, dtype=np.int64)
        ones = self.ones
        n_ones = ones.size
        j = int(np.searchsorted(ones, self.pos))
        if k == 0:
            # no remainder bits -> every one-bit IS a terminator: the
            # chain is j, j+1, ..., j+m-1 with no jump table at all
            if j + m > n_ones:
                raise FlacError("truncated rice partition")
            term = np.arange(j, j + m, dtype=np.int64)
        elif m <= 16:
            jumps = self._jump(k)
            term = np.empty(m, dtype=np.int64)
            for t in range(m):                # pointer chase, O(1)/step
                if j >= n_ones:
                    raise FlacError("truncated rice partition")
                term[t] = j
                j = int(jumps[j])
        else:
            # log-doubling fill: term[t + 2^s] = f^{2^s}(term[t]); each
            # step is one vector gather, so the whole chase is
            # O(m log m) numpy instead of O(m) Python.
            pows = self._jump_pows(k)
            term = np.empty(m, dtype=np.int64)
            term[0] = min(j, n_ones)
            filled = 1
            s = 0
            while filled < m:
                if s == len(pows):
                    prev = pows[-1]
                    pows.append(prev[prev])
                take = min(filled, m - filled)
                term[filled:filled + take] = pows[s][term[:take]]
                filled += take
                s += 1
            if int(term[-1]) >= n_ones:
                raise FlacError("truncated rice partition")
        tpos = ones[term]
        starts = np.empty(m, dtype=np.int64)
        starts[0] = self.pos
        starts[1:] = tpos[:-1] + 1 + k
        q = tpos - starts
        if k:
            idx = tpos[:, None] + 1 + np.arange(k, dtype=np.int64)[None, :]
            if int(idx[-1, -1]) >= self.bits.size:
                raise FlacError("truncated rice remainder")
            rem = self.bits[idx].astype(np.int64) @ \
                (1 << np.arange(k - 1, -1, -1, dtype=np.int64))
        else:
            rem = np.zeros(m, dtype=np.int64)
        self.pos = int(tpos[-1]) + 1 + k
        u = (q << k) | rem
        return (u >> 1) ^ -(u & 1)            # un-zigzag

    def read_signed_block(self, m: int, n: int) -> np.ndarray:
        """m raw signed n-bit values (verbatim / escape partitions)."""
        if m == 0 or n == 0:
            return np.zeros(m, dtype=np.int64)
        if self.pos + m * n > self.bits.size:
            raise FlacError("truncated raw block")
        b = self.bits[self.pos:self.pos + m * n].reshape(m, n)
        self.pos += m * n
        v = b.astype(np.int64) @ (1 << np.arange(n - 1, -1, -1,
                                                 dtype=np.int64))
        return np.where(v >= (1 << (n - 1)), v - (1 << n), v)


# ------------------------------------------------- predictor algebra
def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    """FLAC fixed predictor o's residual == the o-th finite difference
    (RFC 9639 §9.2.3) — vectorized both directions."""
    r = x
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(warm: np.ndarray, res: np.ndarray,
                   order: int) -> np.ndarray:
    """Invert _fixed_residual: o cumsum passes, each seeded by the
    last element of the j-th difference of the warm-up samples. Pure
    numpy — no per-sample Python (scale posture, module docstring)."""
    cur = res.astype(np.int64)
    # seeds[j] = last element of the j-th finite difference of warm —
    # warm has <= 4 elements, so plain-int arithmetic beats numpy's
    # per-call overhead by ~30us/subframe at equal results
    d = [int(w) for w in warm]
    seeds = [d[-1]]
    for _ in range(order - 1):
        d = [d[i + 1] - d[i] for i in range(len(d) - 1)]
        seeds.append(d[-1])
    for j in range(order - 1, -1, -1):
        cur = seeds[j] + np.cumsum(cur)
    return np.concatenate([warm.astype(np.int64), cur])


def _lpc_restore(warm: np.ndarray, res: np.ndarray, coefs: list[int],
                 shift: int) -> np.ndarray:
    """Integer IIR x[i] = res + ((Σ c_j·x[i-1-j]) >> shift); exact in
    Python ints (arbitrary precision; >> is the spec's arithmetic
    shift). Sequential by construction — the reason the codec-registry
    encoder defaults to fixed predictors."""
    o = len(coefs)
    x = [int(w) for w in warm] + [0] * res.size
    rl = res.tolist()
    for i in range(o, len(x)):
        acc = 0
        for j in range(o):
            acc += coefs[j] * x[i - 1 - j]
        x[i] = rl[i - o] + (acc >> shift)
    return np.array(x, dtype=np.int64)


def _lpc_quantize(x: np.ndarray, order: int,
                  precision: int = 12) -> tuple[list[int], int] | None:
    """Levinson-Durbin LPC coefficients, quantized to signed
    `precision` bits with shift chosen to use the full range.
    Returns None when the signal defeats the recursion (constant /
    degenerate autocorrelation)."""
    xf = x.astype(np.float64)
    n = xf.size
    ac = np.array([np.dot(xf[: n - l], xf[l:]) for l in range(order + 1)])
    if ac[0] == 0.0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        k = (ac[i + 1] - np.dot(a[:i], ac[i:0:-1])) / err
        a[: i + 1] = np.concatenate([a[:i] - k * a[:i][::-1], [k]])
        err *= 1.0 - k * k
        if err <= 0.0 or not np.isfinite(err):
            return None
    cmax = np.abs(a).max()
    if cmax == 0.0 or not np.isfinite(cmax):
        return None
    # largest shift (≤15, 5-bit non-negative) keeping every coef in range
    shift = min(15, max(0, precision - 1 - int(np.floor(np.log2(cmax))) - 1))
    lim = 1 << (precision - 1)
    qc = np.clip(np.round(a * (1 << shift)), -lim, lim - 1).astype(np.int64)
    if not qc.any():
        return None
    return [int(c) for c in qc], shift


def _lpc_residual(x: np.ndarray, coefs: list[int],
                  shift: int) -> np.ndarray:
    """Vectorized encode-side residual (the predictor reads ORIGINAL
    samples, so unlike the decode IIR this is one int64 expression)."""
    o = len(coefs)
    acc = np.zeros(x.size - o, dtype=np.int64)
    for j, c in enumerate(coefs):
        acc += c * x[o - 1 - j: x.size - 1 - j]
    return x[o:] - (acc >> shift)     # int64 >> is arithmetic: spec shift


# ------------------------------------------------------ rice encoding
_RICE_ESCAPE = 0b1111                 # 4-bit method-0 escape code
_KS = np.arange(15, dtype=np.int64)   # method-0 parameter range


def _write_rice_partition(bw: _BitWriter, res: np.ndarray, k: int,
                          raw_bits: int) -> None:
    m = res.size
    if k < 0:                          # escape: raw signed raw_bits
        bw.write(_RICE_ESCAPE, 4)
        bw.write(raw_bits, 5)
        if raw_bits:
            bits = ((res[:, None] >> np.arange(raw_bits - 1, -1, -1)) & 1
                    ).astype(np.uint8).reshape(-1)
            bw.write_bits_array(bits)
        return
    bw.write(k, 4)
    if m == 0:
        return
    u = (res << 1) ^ (res >> 63)
    q = u >> k
    lens = q + 1 + k
    ends = np.cumsum(lens)
    total = int(ends[-1])
    bits = np.zeros(total, dtype=np.uint8)
    bits[ends - 1 - k] = 1            # unary terminators
    if k:
        posn = ends[:, None] - k + np.arange(k, dtype=np.int64)[None, :]
        vals = ((u[:, None] >> np.arange(k - 1, -1, -1)) & 1
                ).astype(np.uint8)
        bits[posn.reshape(-1)] = vals.reshape(-1)
    bw.write_bits_array(bits)


def _plan_residual(res: np.ndarray, block: int,
                   order: int) -> tuple[int, list[tuple], int]:
    """Choose partition order 0..6 (RFC 9639 §9.2.7 geometry: 2^p
    equal partitions, the first short by `order` samples) + per-
    partition rice parameter or escape, minimizing exact total bits.

    Vectorized hierarchically: ONE (n × 15) quotient matrix gives the
    finest order's per-partition cost for every parameter via
    np.add.reduceat, and each coarser order's sums/maxima are pairwise
    merges — so the whole 7-order × 15-parameter search is ~15 numpy
    ops per level instead of thousands of per-segment calls (measured
    ~20× on encode). Returns (p, [(seg, k, raw_bits)] with k == -1
    flagging escape, total_cost_bits incl. the 4-bit parameter slots).
    """
    n = res.size
    if n == 0:
        return 0, [(res, 0, 0)], 4
    u = (res << 1) ^ (res >> 63)      # zigzag, int64
    pmax = 0
    while (pmax < 6 and block % (1 << (pmax + 1)) == 0
           and (block >> (pmax + 1)) > order):
        pmax += 1
    psize = block >> pmax
    nparts = 1 << pmax
    counts = np.full(nparts, psize, dtype=np.int64)
    counts[0] = psize - order
    edges = np.concatenate([[0], np.cumsum(counts)[:-1]])
    M = u[:, None] >> _KS             # n × 15 quotients
    sums = np.add.reduceat(M, edges, axis=0)
    umax = np.maximum.reduceat(u, edges)

    best = None
    p = pmax
    while True:
        rice = sums + counts[:, None] * (_KS + 1)
        bk = np.argmin(rice, axis=1)
        brc = rice[np.arange(bk.size), bk]
        rb = np.array([int(v).bit_length() for v in umax], dtype=np.int64)
        esc = 5 + counts * rb
        use_esc = esc < brc
        total = int(np.where(use_esc, esc, brc).sum()) + 4 * bk.size
        if best is None or total < best[0]:
            best = (total, p, bk, use_esc, rb, counts)
        if p == 0:
            break
        sums = sums[0::2] + sums[1::2]
        umax = np.maximum(umax[0::2], umax[1::2])
        counts = counts[0::2] + counts[1::2]
        p -= 1

    total, p, bk, use_esc, rb, counts = best
    plans, off = [], 0
    for t in range(bk.size):
        m = int(counts[t])
        seg = res[off: off + m]
        off += m
        plans.append((seg, -1, int(rb[t])) if use_esc[t]
                     else (seg, int(bk[t]), int(rb[t])))
    return p, plans, total


# ------------------------------------------------------ subframe enc
def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int,
                     use_lpc: bool) -> str:
    """Pick + write the cheapest subframe for one block. Returns the
    chosen type label (tests assert coverage)."""
    n = x.size
    x64 = x.astype(np.int64)
    # wasted bits: common trailing zero bits across the block (RFC
    # §9.2.2); zeros contribute nothing to the OR, so an all-zero
    # block takes the constant path below with wasted = 0
    wasted = 0
    orv = int(np.bitwise_or.reduce(x64)) if n else 0
    if orv:
        wasted = min((orv & -orv).bit_length() - 1, bps - 1)
    if wasted:
        xs = x64 >> wasted
        eb = bps - wasted
    else:
        xs, eb = x64, bps

    if n and (xs == xs[0]).all():
        _write_subframe_header(bw, 0b000000, wasted)
        bw.write_signed(int(xs[0]), eb)
        return "constant"

    cands: list[tuple[int, str, object]] = []
    cands.append((n * eb, "verbatim", None))
    # fixed-order pre-selection (the classic estimator): the best rice
    # parameter's cost is ~m·(k+1) + Σu>>k with k ≈ log2(mean|res|) —
    # estimate that per order from running diffs, then run the exact
    # partition planner only on the winner (5× fewer planner passes)
    r, best_o, best_est = xs, 0, None
    for o in range(0, 5):
        if n <= o:
            break
        if o:
            r = np.diff(r)
        s = int(np.abs(r).sum())
        m = r.size
        k = max(0, (s // m).bit_length() - 1) if m else 0
        est = m * (k + 1) + (2 * s >> k)
        if best_est is None or est < best_est:
            best_o, best_est = o, est
    res = _fixed_residual(xs, best_o)
    p, plans, rcost = _plan_residual(res, n, best_o)
    cands.append((best_o * eb + 6 + rcost, f"fixed{best_o}",
                  (best_o, p, plans)))
    if use_lpc:
        for o in (8,):
            if n <= o * 2:
                continue
            q = _lpc_quantize(xs, o)
            if q is None:
                continue
            coefs, shift = q
            res = _lpc_residual(xs, coefs, shift)
            p, plans, rcost = _plan_residual(res, n, o)
            cands.append((o * eb + 4 + 5 + o * 12 + 6 + rcost,
                          f"lpc{o}", (o, p, plans, coefs, shift)))

    cost, label, info = min(cands, key=lambda c: c[0])
    if label == "verbatim":
        _write_subframe_header(bw, 0b000001, wasted)
        bits = ((xs[:, None] >> np.arange(eb - 1, -1, -1)) & 1
                ).astype(np.uint8).reshape(-1)
        bw.write_bits_array(bits)
        return "verbatim"
    if label.startswith("fixed"):
        o, p, plans = info
        _write_subframe_header(bw, 0b001000 | o, wasted)
        for w in xs[:o]:
            bw.write_signed(int(w), eb)
        _write_residual(bw, p, plans)
        return label
    o, p, plans, coefs, shift = info
    _write_subframe_header(bw, 0b100000 | (o - 1), wasted)
    for w in xs[:o]:
        bw.write_signed(int(w), eb)
    bw.write(12 - 1, 4)                # coefficient precision - 1
    bw.write_signed(shift, 5)
    for c in coefs:
        bw.write_signed(c, 12)
    _write_residual(bw, p, plans)
    return label


def _write_subframe_header(bw: _BitWriter, stype: int,
                           wasted: int) -> None:
    bw.write(0, 1)                     # mandatory zero pad
    bw.write(stype, 6)
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)     # wasted = unary count + 1
    else:
        bw.write(0, 1)


def _write_residual(bw: _BitWriter, p: int, plans: list[tuple]) -> None:
    bw.write(0b00, 2)                  # coding method 0: 4-bit rice
    bw.write(p, 4)
    for seg, k, rb in plans:
        _write_rice_partition(bw, seg, k, rb)


# ------------------------------------------------------- stream enc
def flac_encode(pcm: np.ndarray, sample_rate: int = 16000,
                block_size: int = 4096, use_lpc: bool = False) -> bytes:
    """Mono int16 PCM → FLAC stream (see module docstring for the
    subset and the use_lpc scale trade)."""
    x = np.asarray(pcm, dtype="<i2")
    n = int(x.size)
    if not (1 <= sample_rate < (1 << 20)):
        raise FlacError(f"sample_rate {sample_rate} outside 20-bit range")
    out = bytearray(MAGIC)
    si = _BitWriter()
    si.write(1, 1)                     # last metadata block
    si.write(0, 7)                     # type 0: STREAMINFO
    si.write(34, 24)
    si.write(block_size, 16)           # min block size
    si.write(block_size, 16)           # max block size
    si.write(0, 24)                    # min frame size unknown
    si.write(0, 24)                    # max frame size unknown
    si.write(sample_rate, 20)
    si.write(0, 3)                     # channels - 1
    si.write(15, 5)                    # bits per sample - 1
    si.write(n, 36)
    out += si.getvalue()
    out += hashlib.md5(x.tobytes()).digest()

    for fi, off in enumerate(range(0, n, block_size)):
        blk = x[off: off + block_size]
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)  # sync
        bw.write(0, 1)                  # reserved
        bw.write(0, 1)                  # blocking strategy: fixed
        bw.write(0b0111, 4)             # block size: 16-bit at end
        bw.write(0b0000, 4)             # sample rate: STREAMINFO
        bw.write(0b0000, 4)             # channels: 1, independent
        bw.write(0b100, 3)              # sample size: 16
        bw.write(0, 1)                  # reserved
        for b in _coded_number_encode(fi):
            bw.write(b, 8)
        bw.write(blk.size - 1, 16)
        hdr = bw.getvalue()
        bw.write(crc8(hdr), 8)
        _encode_subframe(bw, blk, 16, use_lpc)
        bw.align()
        frame = bw.getvalue()
        out += frame
        out += crc16(frame).to_bytes(2, "big")
    return bytes(out)


# ------------------------------------------------------- stream dec
#: frame-header block size codes (RFC 9639 table): value, or the
#: number of trailing header bits carrying blocksize-1 (as ("bits", n))
def _block_size_from_code(code: int, br: _BitReader) -> int:
    if code == 0b0000:
        raise FlacError("reserved block size code")
    if code == 0b0001:
        return 192
    if 0b0010 <= code <= 0b0101:
        return 576 << (code - 2)
    if code == 0b0110:
        return br.read(8) + 1
    if code == 0b0111:
        return br.read(16) + 1
    return 256 << (code - 8)


_SR_CODES = {0b0001: 88200, 0b0010: 176400, 0b0011: 192000,
             0b0100: 8000, 0b0101: 16000, 0b0110: 22050, 0b0111: 24000,
             0b1000: 32000, 0b1001: 44100, 0b1010: 48000, 0b1011: 96000}


def _sample_rate_from_code(code: int, br: _BitReader,
                           streaminfo_sr: int) -> int:
    if code == 0b0000:
        return streaminfo_sr
    if code in _SR_CODES:
        return _SR_CODES[code]
    if code == 0b1100:
        return br.read(8) * 1000
    if code == 0b1101:
        return br.read(16)
    if code == 0b1110:
        return br.read(16) * 10
    raise FlacError("invalid sample rate code")


def _read_residual(br: _BitReader, block: int,
                   order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise FlacError("reserved residual coding method")
    pbits, esc = (4, 0b1111) if method == 0 else (5, 0b11111)
    p = br.read(4)
    if block % (1 << p):
        raise FlacError("block size not divisible by partition count")
    psize = block >> p
    segs = []
    for t in range(1 << p):
        m = psize - order if t == 0 else psize
        if m < 0:
            raise FlacError("partition shorter than predictor order")
        k = br.read(pbits)
        if k == esc:
            rb = br.read(5)
            segs.append(br.read_signed_block(m, rb))
        else:
            segs.append(br.read_rice_block(m, k))
    return np.concatenate(segs) if segs else np.zeros(0, dtype=np.int64)


def _read_subframe(br: _BitReader, block: int, bps: int) -> tuple:
    """One subframe → (samples int64, type label)."""
    if br.read(1):
        raise FlacError("subframe pad bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eb = bps - wasted
    if eb <= 0:
        raise FlacError("wasted bits exceed sample size")
    if stype == 0b000000:
        v = br.read_signed(eb)
        x = np.full(block, v, dtype=np.int64)
        label = "constant"
    elif stype == 0b000001:
        x = br.read_signed_block(block, eb)
        label = "verbatim"
    elif 0b001000 <= stype <= 0b001100:
        o = stype - 0b001000
        if o > block:
            raise FlacError("fixed order exceeds block size")
        warm = np.array([br.read_signed(eb) for _ in range(o)],
                        dtype=np.int64)
        res = _read_residual(br, block, o)
        x = _fixed_restore(warm, res, o) if o else res
        label = f"fixed{o}"
    elif stype >= 0b100000:
        o = (stype & 0x1F) + 1
        if o > block:
            raise FlacError("lpc order exceeds block size")
        warm = np.array([br.read_signed(eb) for _ in range(o)],
                        dtype=np.int64)
        prec = br.read(4)
        if prec == 0b1111:
            raise FlacError("invalid lpc precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative lpc shift")
        coefs = [br.read_signed(prec) for _ in range(o)]
        res = _read_residual(br, block, o)
        x = _lpc_restore(warm, res, coefs, shift)
        label = f"lpc{o}"
    else:
        raise FlacError(f"reserved subframe type {stype:06b}")
    if wasted:
        x = x << wasted
    return x, label


def _parse_streaminfo(buf: bytes) -> dict:
    if len(buf) < 4 or buf[:4] != MAGIC:
        raise FlacError("bad magic")
    pos = 4
    info = None
    last = False
    while not last:
        if pos + 4 > len(buf):
            raise FlacError("truncated metadata header")
        hdr = int.from_bytes(buf[pos: pos + 4], "big")
        last = bool(hdr >> 31)
        btype = (hdr >> 24) & 0x7F
        blen = hdr & 0xFFFFFF
        pos += 4
        if pos + blen > len(buf):
            raise FlacError("truncated metadata block")
        if btype == 0:
            if blen != 34 or info is not None:
                raise FlacError("bad STREAMINFO")
            b = buf[pos: pos + 34]
            v = int.from_bytes(b[:18], "big")
            info = {
                "min_block": v >> 128, "max_block": (v >> 112) & 0xFFFF,
                "sample_rate": (v >> 44) & 0xFFFFF,
                "channels": ((v >> 41) & 0x7) + 1,
                "bps": ((v >> 36) & 0x1F) + 1,
                "total_samples": v & ((1 << 36) - 1),
                "md5": b[18:34],
            }
        elif btype == 127:
            raise FlacError("forbidden metadata type")
        pos += blen
    if info is None:
        raise FlacError("no STREAMINFO block")
    if info["sample_rate"] == 0:
        raise FlacError("zero sample rate")
    info["frames_at"] = pos
    return info


def _decode_frames(buf: bytes, info: dict, collect_labels: list | None
                   ) -> np.ndarray:
    if info["channels"] != 1 or info["bps"] != 16:
        raise FlacError(
            f"subset decoder: mono 16-bit only, stream is "
            f"{info['channels']}ch/{info['bps']}bit")
    br = _BitReader(buf)
    br.pos = info["frames_at"] * 8
    chunks: list[np.ndarray] = []
    expect_fi = 0
    while br.pos < br.bits.size:
        start_byte = br.pos // 8
        # the fixed 32-bit frame-header prefix in one read (sync 14,
        # reserved 1, blocking 1, bs 4, sr 4, ch 4, ss 3, reserved 1)
        hdr = br.read(32)
        if hdr >> 18 != 0b11111111111110:
            raise FlacError("bad frame sync")
        if hdr & (1 << 17):
            raise FlacError("frame reserved bit set")
        blocking = (hdr >> 16) & 1
        bs_code = (hdr >> 12) & 0xF
        sr_code = (hdr >> 8) & 0xF
        ch_code = (hdr >> 4) & 0xF
        ss_code = (hdr >> 1) & 0x7
        if hdr & 1:
            raise FlacError("frame reserved bit 2 set")
        coded = _coded_number_decode(br)
        block = _block_size_from_code(bs_code, br)
        _sample_rate_from_code(sr_code, br, info["sample_rate"])
        if ch_code != 0b0000:
            raise FlacError("subset decoder: mono frames only")
        if ss_code == 0b000:
            bps = info["bps"]
        elif ss_code == 0b100:
            bps = 16
        else:
            raise FlacError("subset decoder: 16-bit frames only")
        if blocking == 0 and coded != expect_fi:
            raise FlacError(f"frame number {coded} != {expect_fi}")
        hdr_end = br.pos // 8
        if crc8(buf[start_byte:hdr_end]) != br.read(8):
            raise FlacError("frame header CRC-8 mismatch")
        x, label = _read_subframe(br, block, bps)
        if collect_labels is not None:
            collect_labels.append(label)
        br.align()
        crc_end = br.pos // 8
        if crc16(buf[start_byte:crc_end]) != br.read(16):
            raise FlacError("frame CRC-16 mismatch")
        lim = 1 << (bps - 1)
        if x.size and (int(x.max()) >= lim or int(x.min()) < -lim):
            raise FlacError("decoded sample out of range")
        chunks.append(x)
        expect_fi += 1
    out = (np.concatenate(chunks) if chunks
           else np.zeros(0, dtype=np.int64)).astype("<i2")
    total = info["total_samples"]
    if total and out.size != total:
        raise FlacError(f"decoded {out.size} samples, STREAMINFO says "
                        f"{total}")
    md5 = info["md5"]
    if md5 != b"\x00" * 16 and hashlib.md5(out.tobytes()).digest() != md5:
        raise FlacError("MD5 signature mismatch")
    return out


def flac_decode(buf: bytes | bytearray | memoryview
                ) -> np.ndarray | None:
    """FLAC stream → mono int16 PCM, or None when the stream is
    malformed, truncated, CRC/MD5-damaged, or outside the documented
    subset (the payload check's undecodable contract)."""
    try:
        b = bytes(buf)
        return _decode_frames(b, _parse_streaminfo(b), None)
    except FlacError:
        return None


def frame_info(buf: bytes) -> dict:
    """Decode with introspection: STREAMINFO fields + per-subframe
    type labels (tests assert the encoder exercises each coding
    shape). Raises FlacError on malformed input."""
    b = bytes(buf)
    info = _parse_streaminfo(b)
    labels: list[str] = []
    samples = _decode_frames(b, info, labels)
    return {**{k: info[k] for k in ("min_block", "max_block",
                                    "sample_rate", "channels", "bps",
                                    "total_samples")},
            "subframes": labels, "n_decoded": int(samples.size)}
