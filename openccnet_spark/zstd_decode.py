"""Pure-Python Zstandard (RFC 8878) frame DECOMPRESSOR — no codec wheel
ships in this sandbox, and the reference's third bundle format is a
zstd-compressed JSON dictionary pack (``OpenccNetLib/DictionaryLib.cs:552-583``,
fixture ``OpenccNetLib/dicts/dictionary_maxlength.zstd``). This module
implements the decoding subset every standard single-frame file needs:

* frame header (window descriptor / single-segment, frame content size,
  content checksum skipped-over), skippable frames;
* raw, RLE and compressed blocks;
* literals: raw / RLE / Huffman-compressed (1 or 4 streams) / treeless
  (tree reuse across blocks);
* Huffman tree descriptions, both direct (4-bit weights) and
  FSE-compressed (two interleaved states, RFC 4.2.1);
* sequences: predefined / RLE / FSE-compressed / repeat modes for the
  literal-length, offset and match-length code tables, the backward
  bitstream, and the 3-slot repeat-offset history with its
  literals_length==0 special case.

Deliberately NOT implemented (this is a decoder for trusted fixtures, not
a general container): external dictionaries (Dictionary_ID != 0 raises)
and xxhash verification of the content checksum (the 4 bytes are skipped;
the byte-exact fixture comparison in tests is a stronger end-to-end check).

Everything here derives from the public RFC 8878 / zstd format
documentation. Decode speed is secondary (one bundle load, cached).
"""

from __future__ import annotations

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_LO = 0x184D2A50
SKIPPABLE_HI = 0x184D2A5F


class ZstdError(ValueError):
    pass


# --------------------------------------------------------------------------
# bit readers
# --------------------------------------------------------------------------


class _FwdBits:
    """LSB-first forward reader (FSE table descriptions, RFC 4.1.1)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        lo = self.pos >> 3
        hi = (self.pos + n - 1) >> 3
        chunk = int.from_bytes(self.data[lo : hi + 1], "little")
        val = (chunk >> (self.pos - 8 * lo)) & ((1 << n) - 1)
        self.pos += n
        return val

    def rewind(self, n: int):
        self.pos -= n

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


class _BackBits:
    """Backward reader: bitstreams are written little-endian and read from
    the last byte toward the first; the highest set bit of the last byte
    is a padding sentinel (RFC 4.1). Reads past the start zero-fill the
    LOW bits and drive ``remaining`` negative (the FSE interleaved-weights
    loop relies on that, mirroring the spec's reference flow)."""

    __slots__ = ("data", "pos", "remaining")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ZstdError("corrupt bitstream: missing sentinel")
        self.data = data
        last = data[-1]
        self.pos = (len(data) - 1) * 8 + (last.bit_length() - 1)
        self.remaining = self.pos

    def peek(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos - n
        mask = (1 << n) - 1
        if p >= 0:
            lo = p >> 3
            hi = (self.pos - 1) >> 3
            chunk = int.from_bytes(self.data[lo : hi + 1], "little")
            return (chunk >> (p - 8 * lo)) & mask
        avail = self.pos  # only bits [0, pos) exist
        if avail <= 0:
            return 0
        chunk = int.from_bytes(self.data[0 : (avail + 7) >> 3], "little")
        return ((chunk & ((1 << avail) - 1)) << (n - avail)) & mask

    def consume(self, n: int):
        self.pos -= n
        self.remaining -= n

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.consume(n)
        return v


# --------------------------------------------------------------------------
# FSE
# --------------------------------------------------------------------------


def _fse_build_table(counts: list[int], accuracy_log: int):
    """Decoding table from normalized counts: (symbol, nb_bits, base)
    per state, via the spec's spread-and-number algorithm (RFC 4.1.1)."""
    size = 1 << accuracy_log
    symbols = [0] * size
    high = size - 1
    # "less than one" (-1) symbols take one cell each from the top
    for s, c in enumerate(counts):
        if c == -1:
            symbols[high] = s
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, c in enumerate(counts):
        if c <= 0:
            continue
        for _ in range(c):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdError("corrupt FSE table: spread did not close")
    nxt = [max(c, 1) if c != 0 else 0 for c in counts]
    table = [None] * size
    for i in range(size):
        s = symbols[i]
        x = nxt[s]
        nxt[s] = x + 1
        nb = accuracy_log - (x.bit_length() - 1)
        table[i] = (s, nb, (x << nb) - size)
    return table


def _fse_read_distribution(data: bytes, max_accuracy: int):
    """(counts, accuracy_log, header_bytes) from a bit-packed FSE table
    description (RFC 4.1.1). Variable-size count encoding with the
    low/high threshold trick and 2-bit zero-repeat flags."""
    br = _FwdBits(data)
    accuracy_log = 5 + br.read(4)
    if accuracy_log > max_accuracy:
        raise ZstdError(f"FSE accuracy {accuracy_log} > max {max_accuracy}")
    remaining = (1 << accuracy_log) + 1
    counts: list[int] = []
    while remaining > 1 and len(counts) < 256:
        bits = remaining.bit_length()
        val = br.read(bits)
        lower_mask = (1 << (bits - 1)) - 1
        # NB ``remaining`` here is the spec's remaining+1 (starts at
        # (1<<AL)+1, loop floor 1), so the spec's (2^bits)-1-(remaining+1)
        # threshold is written against that convention
        threshold = (1 << bits) - 1 - remaining
        if (val & lower_mask) < threshold:
            br.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        proba = val - 1
        counts.append(proba)
        remaining -= -proba if proba < 0 else proba
        if proba == 0:
            while True:
                rep = br.read(2)
                counts.extend([0] * rep)
                if rep != 3:
                    break
    return counts, accuracy_log, br.bytes_consumed()


def _fse_decode_interleaved(table, accuracy_log: int, data: bytes, limit: int = 255):
    """Two alternating FSE states over one backward bitstream (Huffman
    weights, RFC 4.2.1.2). Stops when a state update runs past the stream
    start, emitting the other state's pending symbol."""
    br = _BackBits(data)
    s1 = br.read(accuracy_log)
    s2 = br.read(accuracy_log)
    out: list[int] = []
    while len(out) < limit:
        sym, nb, base = table[s1]
        out.append(sym)
        s1 = base + br.read(nb)
        if br.remaining < 0:
            out.append(table[s2][0])
            break
        sym, nb, base = table[s2]
        out.append(sym)
        s2 = base + br.read(nb)
        if br.remaining < 0:
            out.append(table[s1][0])
            break
    return out


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------


def _huf_table_from_weights(weights: list[int]):
    """(dtable, max_bits): dtable[state] = (symbol, nb_bits) for a
    2^max_bits-entry canonical table; the LAST weight is implied so the
    weight powers complete a power of two (RFC 4.2.1)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("corrupt Huffman weights: empty")
    next_pow2 = 1 << total.bit_length()
    left = next_pow2 - total
    if left & (left - 1):
        raise ZstdError("corrupt Huffman weights: no valid last weight")
    last_w = left.bit_length()  # 2^(w-1) == left
    weights = weights + [last_w]
    max_bits = next_pow2.bit_length() - 1
    size = 1 << max_bits
    dtable = [(0, 0)] * size
    idx = 0
    for w in range(1, max_bits + 1):
        nb = max_bits + 1 - w
        for sym, ws in enumerate(weights):
            if ws == w:
                span = 1 << (w - 1)
                dtable[idx : idx + span] = [(sym, nb)] * span
                idx += span
    if idx != size:
        raise ZstdError("corrupt Huffman weights: table not filled")
    return dtable, max_bits


def _huf_read_tree(data: bytes):
    """(dtable, max_bits, bytes_consumed) from a Huffman tree description."""
    hbyte = data[0]
    if hbyte >= 128:  # direct: 4-bit weights, high nibble first
        n = hbyte - 127
        nbytes = (n + 1) >> 1
        raw = data[1 : 1 + nbytes]
        weights = []
        for i in range(n):
            b = raw[i >> 1]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        dtable, max_bits = _huf_table_from_weights(weights)
        return dtable, max_bits, 1 + nbytes
    comp = data[1 : 1 + hbyte]
    counts, al, hdr = _fse_read_distribution(comp, 6)
    table = _fse_build_table(counts, al)
    weights = _fse_decode_interleaved(table, al, comp[hdr:])
    dtable, max_bits = _huf_table_from_weights(weights)
    return dtable, max_bits, 1 + hbyte


def _huf_decode_stream(data: bytes, dtable, max_bits: int, regen: int) -> bytearray:
    br = _BackBits(data)
    peek, consume = br.peek, br.consume
    out = bytearray(regen)
    for i in range(regen):
        sym, nb = dtable[peek(max_bits)]
        out[i] = sym
        consume(nb)
    return out


# --------------------------------------------------------------------------
# sequences: code tables and predefined distributions (RFC 3.1.1.3.2)
# --------------------------------------------------------------------------

_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2,
     2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
# RFC 8878 §3.1.1.3.2.2.1 ML_defaultNorm: 1-counts run through code 45
# (match lengths up to ~128) and only codes 46-52 are "less-than-one".
# (A truncated table decodes the wrong match length for any predefined-
# mode state mapped past code 25 — silent output corruption, caught by
# fuzzing against the zstd CLI.)
_ML_DEFAULT = (
    [1, 4, 3] + [2] * 6 + [1] * 37 + [-1] * 7,
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, -1, -1, -1, -1, -1],
    5,
)

_MAX_AL = {"ll": 9, "of": 8, "ml": 9}
_DEFAULTS = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}


def _read_seq_table(kind: str, mode: int, data: bytes, pos: int, prev):
    """One of the three sequence code tables per its 2-bit mode. Returns
    ((table, accuracy_log), new_pos). RLE is a 1-state pseudo-table."""
    if mode == 0:  # predefined
        counts, al = _DEFAULTS[kind]
        return (_fse_build_table(counts, al), al), pos
    if mode == 1:  # RLE: one byte symbol, zero-bit state
        sym = data[pos]
        return ([(sym, 0, 0)], 0), pos + 1
    if mode == 2:  # FSE-compressed description
        counts, al, hdr = _fse_read_distribution(data[pos:], _MAX_AL[kind])
        return (_fse_build_table(counts, al), al), pos + hdr
    if prev is None:  # repeat with no previous table
        raise ZstdError(f"repeat mode for {kind} with no previous table")
    return prev, pos


# --------------------------------------------------------------------------
# block decoding
# --------------------------------------------------------------------------


class _FrameState:
    """Cross-block state one frame carries: the previous Huffman literals
    table (treeless blocks) and the previous sequence tables (repeat
    mode), plus the 3-slot repeat-offset history."""

    def __init__(self):
        self.huf = None  # (dtable, max_bits)
        self.tables = {"ll": None, "of": None, "ml": None}
        self.rep = [1, 4, 8]


def _decode_literals(block: bytes, st: _FrameState):
    """(literals, bytes_consumed) for the literals section (RFC 3.1.1.3.1)."""
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):
            rs = b0 >> 3
            hdr = 1
        elif sf == 1:
            rs = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            rs = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if ltype == 0:
            return bytes(block[hdr : hdr + rs]), hdr + rs
        return bytes([block[hdr]]) * rs, hdr + 1
    # compressed (2) / treeless (3)
    if sf == 0:
        n_streams, szbits, hdr = 1, 10, 3
    elif sf == 1:
        n_streams, szbits, hdr = 4, 10, 3
    elif sf == 2:
        n_streams, szbits, hdr = 4, 14, 4
    else:
        n_streams, szbits, hdr = 4, 18, 5
    packed = int.from_bytes(block[:hdr], "little") >> 4
    rs = packed & ((1 << szbits) - 1)
    cs = (packed >> szbits) & ((1 << szbits) - 1)
    body = block[hdr : hdr + cs]
    off = 0
    if ltype == 2:
        dtable, max_bits, off = _huf_read_tree(body)
        st.huf = (dtable, max_bits)
    elif st.huf is None:
        raise ZstdError("treeless literals with no previous Huffman table")
    dtable, max_bits = st.huf
    if n_streams == 1:
        lits = _huf_decode_stream(body[off:], dtable, max_bits, rs)
    else:
        s1 = int.from_bytes(body[off : off + 2], "little")
        s2 = int.from_bytes(body[off + 2 : off + 4], "little")
        s3 = int.from_bytes(body[off + 4 : off + 6], "little")
        off += 6
        part = (rs + 3) >> 2
        sizes = [s1, s2, s3, len(body) - off - s1 - s2 - s3]
        regens = [part, part, part, rs - 3 * part]
        lits = bytearray()
        for sz, rg in zip(sizes, regens):
            lits += _huf_decode_stream(body[off : off + sz], dtable, max_bits, rg)
            off += sz
    return bytes(lits), hdr + cs


def _decode_compressed_block(block: bytes, st: _FrameState, out: bytearray):
    lits, consumed = _decode_literals(block, st)
    data = block[consumed:]
    b0 = data[0]
    if b0 < 128:
        nseq, pos = b0, 1
    elif b0 < 255:
        nseq, pos = ((b0 - 128) << 8) | data[1], 2
    else:
        nseq, pos = data[1] | (data[2] << 8) | 0x7F00, 3
    if nseq == 0:
        out += lits
        return
    modes = data[pos]
    pos += 1
    ll_t, pos = _read_seq_table("ll", (modes >> 6) & 3, data, pos, st.tables["ll"])
    of_t, pos = _read_seq_table("of", (modes >> 4) & 3, data, pos, st.tables["of"])
    ml_t, pos = _read_seq_table("ml", (modes >> 2) & 3, data, pos, st.tables["ml"])
    st.tables.update(ll=ll_t, of=of_t, ml=ml_t)
    br = _BackBits(data[pos:])
    (ll_tab, ll_al), (of_tab, of_al), (ml_tab, ml_al) = ll_t, of_t, ml_t
    ll_s = br.read(ll_al)
    of_s = br.read(of_al)
    ml_s = br.read(ml_al)
    rep = st.rep
    lit_pos = 0
    for i in range(nseq):
        of_code = of_tab[of_s][0]
        offset_val = (1 << of_code) + br.read(of_code)
        ml_code = ml_tab[ml_s][0]
        match_len = _ML_BASE[ml_code] + br.read(_ML_BITS[ml_code])
        ll_code = ll_tab[ll_s][0]
        lit_len = _LL_BASE[ll_code] + br.read(_LL_BITS[ll_code])
        # repeat-offset history with the lit_len == 0 shift (RFC 3.1.1.5)
        if offset_val > 3:
            offset = offset_val - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = offset_val - 1 + (1 if lit_len == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # idx == 3: Repeated_Offset1 - 1
                offset = rep[0] - 1
                if offset == 0:
                    raise ZstdError("corrupt sequence: zero offset")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        if i + 1 < nseq:  # state updates in LL, ML, OF order
            s, nb, base = ll_tab[ll_s]
            ll_s = base + br.read(nb)
            s, nb, base = ml_tab[ml_s]
            ml_s = base + br.read(nb)
            s, nb, base = of_tab[of_s]
            of_s = base + br.read(nb)
        out += lits[lit_pos : lit_pos + lit_len]
        lit_pos += lit_len
        if offset > len(out):
            raise ZstdError("corrupt sequence: offset beyond window")
        if offset >= match_len:  # non-overlapping: one slice
            start = len(out) - offset
            out += out[start : start + match_len]
        else:  # overlapping copy, byte semantics
            start = len(out) - offset
            for k in range(match_len):
                out.append(out[start + k])
    out += lits[lit_pos:]


def _decode_frame(data: bytes, pos: int, out: bytearray) -> int:
    fhd = data[pos]
    pos += 1
    dict_flag = fhd & 3
    checksum = (fhd >> 2) & 1
    single = (fhd >> 5) & 1
    fcs_flag = fhd >> 6
    if not single:
        pos += 1  # window descriptor (size checks are the caller's concern)
    pos += (0, 1, 2, 4)[dict_flag]
    if dict_flag and int.from_bytes(data[pos - (0, 1, 2, 4)[dict_flag] : pos], "little"):
        raise ZstdError("external dictionaries are not supported")
    fcs_bytes = (1 if single else 0, 2, 4, 8)[fcs_flag]
    pos += fcs_bytes  # frame content size: informational here
    st = _FrameState()
    while True:
        hdr = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = hdr & 1
        btype = (hdr >> 1) & 3
        bsize = hdr >> 3
        if btype == 0:  # raw
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            _decode_compressed_block(data[pos : pos + bsize], st, out)
            pos += bsize
        else:
            raise ZstdError("reserved block type")
        if last:
            break
    if checksum:
        pos += 4  # xxhash64 low 32 bits: skipped (see module docstring)
    return pos


def decompress(data: bytes) -> bytes:
    """Decompress a standard zstd byte stream (1+ frames, skippables ok)."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        magic = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if SKIPPABLE_LO <= magic <= SKIPPABLE_HI:
            size = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4 + size
            continue
        if magic != ZSTD_MAGIC:
            raise ZstdError(f"bad magic 0x{magic:08x}")
        pos = _decode_frame(data, pos, out)
    return bytes(out)
