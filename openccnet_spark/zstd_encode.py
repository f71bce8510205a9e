"""Pure-Python Zstandard (RFC 8878) frame COMPRESSOR.

The inverse of ``zstd_decode.py`` for the subset the dictionary-bundle
writer needs: real LZ77 compression into COMPRESSED blocks whose
sequences use the spec's PREDEFINED FSE distributions (no table
descriptions to write) and whose literals are stored raw — every byte of
output is spec-mandated structure plus the entropy-coded sequence
bitstream. Output is a standard single-frame stream any zstd reader
accepts (verified in tests against both ``zstd_decode.decompress`` and
the system zstd CLI).

Design choices, smallest-spec-surface first:

* greedy hash-chain match finder (4-byte hashes, bounded chain walk),
  min match 4, offsets span the whole frame (single-segment window);
* one compressed block per 128 KB of input (Block_Maximum_Size); a chunk
  whose compressed form would not fit/shrink degrades to a raw block;
* sequences: predefined mode for all three code tables — the encoder is
  the exact inverse of ``zstd_decode``'s table walk (pick the cell of
  the symbol whose value range contains the next decoder state, emit the
  delta bits), with the bitstream assembled in decode-read order and
  serialized backward under the padding sentinel;
* repeat-offset codes are never emitted (offset_value = offset + 3
  always), so blocks stay independent of the 3-slot history;
* literals raw: the bundle's JSON/UTF-8 alphabet exceeds the 128-symbol
  limit of the DIRECT Huffman weight description, and FSE-compressed
  weights buy little once LZ has removed the redundancy (measured ~6%
  on the reference bundle) — not worth the extra encoder surface.

Everything here derives from the public RFC 8878 / zstd format
documentation. Compression speed is secondary (one bundle write).
"""

from __future__ import annotations

from .zstd_decode import (
    _LL_BASE,
    _LL_BITS,
    _LL_DEFAULT,
    _ML_BASE,
    _ML_BITS,
    _ML_DEFAULT,
    _OF_DEFAULT,
    _fse_build_table,
)

ZSTD_MAGIC = 0xFD2FB528
BLOCK_MAX = 128 * 1024
MIN_MATCH = 4
#: bounded hash-chain walk — compression/speed knob, not correctness
CHAIN_DEPTH = 16


# --------------------------------------------------------------------------
# FSE encoding tables (inverse of zstd_decode._fse_build_table)
# --------------------------------------------------------------------------


class _FseEncoder:
    """Encoding view of one FSE decoding table: for (symbol, next decoder
    state v) find the table cell i with that symbol whose value range
    [base, base + 2^nb) contains v; the written bits are v - base and the
    new decoder state is i. Processing the symbol stream BACKWARD with
    this step yields exactly the stream the decoder's forward walk reads.
    """

    def __init__(self, counts, accuracy_log: int):
        table = _fse_build_table(counts, accuracy_log)
        self.accuracy_log = accuracy_log
        self.cells: dict[int, list[tuple[int, int, int]]] = {}
        for i, (sym, nb, base) in enumerate(table):
            self.cells.setdefault(sym, []).append((base, nb, i))

    def encode(self, sym: int, state: int) -> tuple[int, int, int]:
        """(bits_value, bits_count, new_state) stepping state 'backward'
        through a cell of ``sym``."""
        for base, nb, idx in self.cells[sym]:
            if base <= state < base + (1 << nb):
                return state - base, nb, idx
        raise AssertionError(f"FSE encode: no cell for sym={sym} state={state}")

    def init_state(self, sym: int) -> int:
        """Any cell of ``sym`` works as the final (first-decoded) state;
        the first in table order is canonical enough."""
        return self.cells[sym][0][2]


class _RleEncoder:
    """Mode-1 (RLE) pseudo-table: one symbol, zero-bit states."""

    accuracy_log = 0

    def __init__(self, sym: int):
        self.sym = sym

    def encode(self, sym: int, state: int) -> tuple[int, int, int]:
        return 0, 0, 0

    def init_state(self, sym: int) -> int:
        return 0


_LL_ENC = _FseEncoder(*_LL_DEFAULT)
_OF_ENC = _FseEncoder(*_OF_DEFAULT)
_ML_ENC = _FseEncoder(*_ML_DEFAULT)


# --------------------------------------------------------------------------
# custom FSE table descriptions (Compressed_Mode) — inverse of
# zstd_decode._fse_read_distribution
# --------------------------------------------------------------------------


def _normalize_counts(hist: dict[int, int], accuracy_log: int) -> list[int]:
    """Histogram -> normalized counts summing (with -1 entries counting 1)
    to exactly 2^accuracy_log; every present symbol stays representable
    (rare ones as -1, the spec's 'less than one' probability)."""
    table = 1 << accuracy_log
    total = sum(hist.values())
    max_sym = max(hist)
    counts = [0] * (max_sym + 1)
    for s, c in hist.items():
        n = c * table // total
        counts[s] = n if n > 0 else -1
    cells = sum(c if c > 0 else 1 for c in counts if c != 0)
    # deterministic fix-up: push the difference onto the most probable
    # symbols (decrementing never drops a positive count below 1)
    order = sorted(hist, key=lambda s: (-hist[s], s))
    i = 0
    while cells < table:
        s = order[i % len(order)]
        if counts[s] > 0:
            counts[s] += 1
            cells += 1
        elif counts[s] == -1 and len(order) == 1:
            counts[s] = 1
            cells += 1
        i += 1
    i = 0
    stall = 0
    while cells > table:
        s = order[i % len(order)]
        if counts[s] > 1:
            counts[s] -= 1
            cells -= 1
            stall = 0
        else:
            stall += 1
            if stall > len(order):  # cannot happen for AL >= 8 over <= 53 syms
                raise AssertionError("FSE normalize: cannot shrink to table size")
        i += 1
    return counts


def _fse_write_distribution(counts: list[int], accuracy_log: int) -> bytes:
    """Bit-packed FSE table description (RFC 4.1.1) — the exact inverse of
    the reader: variable-width count fields with the low/high threshold
    trick and 2-bit zero-run flags after each zero count."""
    acc = 0
    nbits = 0

    def put(v: int, n: int):
        nonlocal acc, nbits
        acc |= v << nbits
        nbits += n

    put(accuracy_log - 5, 4)
    remaining = (1 << accuracy_log) + 1  # the reader's remaining+1 convention
    i = 0
    while remaining > 1 and i < len(counts):
        proba = counts[i]
        i += 1
        bits = remaining.bit_length()
        lower_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        v = proba + 1  # -1 -> 0
        if v < threshold:
            put(v, bits - 1)
        elif v <= lower_mask:
            put(v, bits)
        else:
            put(v + threshold, bits)
        remaining -= -proba if proba < 0 else proba
        if proba == 0:
            # 2-bit runs of following zeros (flag 3 = continue)
            run = 0
            while i + run < len(counts) and counts[i + run] == 0:
                run += 1
            i += run
            while True:
                rep = min(run, 3)
                put(rep, 2)
                run -= rep
                if rep != 3:
                    break
    if remaining != 1:
        raise AssertionError("FSE writer: counts do not sum to the table size")
    return acc.to_bytes((nbits + 7) // 8, "little")


def _choose_seq_table(kind: str, hist: dict[int, int], nseq: int):
    """(mode, description_bytes, encoder) for one code table: RLE when one
    symbol, custom FSE when the block has enough sequences to amortize the
    description, predefined otherwise."""
    from .zstd_decode import _MAX_AL

    if len(hist) == 1:
        sym = next(iter(hist))
        return 1, bytes([sym]), _RleEncoder(sym)
    if nseq >= 64:
        al = _MAX_AL[kind]
        counts = _normalize_counts(hist, al)
        return 2, _fse_write_distribution(counts, al), _FseEncoder(counts, al)
    return 0, b"", {"ll": _LL_ENC, "of": _OF_ENC, "ml": _ML_ENC}[kind]

# max symbol values encodable with one predefined-mode sequence
_LL_MAX = _LL_BASE[-1] + (1 << _LL_BITS[-1]) - 1
_ML_MAX = _ML_BASE[-1] + (1 << _ML_BITS[-1]) - 1
_OF_MAX_LOG = len(_OF_DEFAULT[0]) - 1  # highest offset code


def _code_for(value: int, bases: list[int]) -> int:
    """Largest code whose base <= value (bases ascending)."""
    import bisect

    return bisect.bisect_right(bases, value) - 1


# --------------------------------------------------------------------------
# match finder
# --------------------------------------------------------------------------


def _hash4(data: bytes, i: int) -> int:
    return (
        data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) | (data[i + 3] << 24)
    ) * 2654435761 & 0xFFFFFFFF


def _rep_update(rep: list, offset: int, lit_len: int) -> int:
    """Offset_Value for ``offset`` given the decoder's 3-slot repeat
    history, mutating ``rep`` exactly like the decoder's forward walk
    (RFC 3.1.1.5, incl. the lit_len==0 index shift). Returns the small
    repeat code (1-3) when the offset is in history, else offset+3."""
    if lit_len > 0:
        if offset == rep[0]:
            return 1  # idx 0: no history change
        if offset == rep[1]:
            ov = 2
        elif offset == rep[2]:
            ov = 3
        else:
            ov = None
    else:
        if offset == rep[1]:
            ov = 1
        elif offset == rep[2]:
            ov = 2
        elif offset == rep[0] - 1 and offset > 0:
            ov = 3
        else:
            ov = None
    if ov is None:
        rep[2] = rep[1]
        rep[1] = rep[0]
        rep[0] = offset
        return offset + 3
    idx = ov - 1 + (1 if lit_len == 0 else 0)
    if idx == 1:
        rep[0], rep[1] = rep[1], rep[0]
    elif idx == 2:
        rep[0], rep[1], rep[2] = rep[2], rep[0], rep[1]
    else:  # idx == 3
        off = rep[0] - 1
        rep[2] = rep[1]
        rep[1] = rep[0]
        rep[0] = off
    return ov


def _find_block_sequences(
    data: bytes, start: int, end: int, chains: dict, rep: list
) -> tuple[list[tuple[int, int, int]], bytes]:
    """Greedy LZ over data[start:end] with offsets reaching anywhere back
    into ``data`` (the frame window). Returns (sequences, literals) where
    each sequence is (lit_len, offset, match_len); leftover literals after
    the last match are appended to ``literals`` (the decoder's
    ``lits[lit_pos:]`` tail).

    ``rep`` is the frame's repeat-offset history (shared with the
    encoder's replay): a match at the current rep0 offset is probed first
    and preferred unless the chain finds a clearly longer one — rep-coded
    offsets cost 0-1 extra bits vs ~log2(offset) for literal offsets, the
    dominant term of the sequence bitstream on structured inputs."""
    seqs: list[tuple[int, int, int]] = []
    lits = bytearray()
    pos = start
    anchor = start
    limit = end - MIN_MATCH
    while pos <= limit:
        h = _hash4(data, pos)
        cand = chains.get(h)
        max_len = min(end - pos, _ML_MAX)
        r0 = rep[0]
        rep_len = 0
        if r0 <= pos:
            src = pos - r0
            while rep_len < max_len and data[src + rep_len] == data[pos + rep_len]:
                rep_len += 1
            if rep_len < 3:
                rep_len = 0
        chain_len = 0
        chain_off = 0
        if cand:
            for prev in reversed(cand[-CHAIN_DEPTH:]):
                if data[prev : prev + MIN_MATCH] != data[pos : pos + MIN_MATCH]:
                    continue
                length = MIN_MATCH
                while (
                    length < max_len and data[prev + length] == data[pos + length]
                ):
                    length += 1
                if length > chain_len and pos - prev < (1 << _OF_MAX_LOG):
                    chain_len = length
                    chain_off = pos - prev
                    if length >= 128:  # long enough; stop searching
                        break
        # a rep-coded offset costs 0-1 extra bits vs ~log2(offset) for a
        # literal offset — prefer rep unless the chain match is 2+ longer
        if rep_len and rep_len + 2 >= chain_len:
            best_len, best_off = rep_len, r0
        elif chain_len >= MIN_MATCH:
            best_len, best_off = chain_len, chain_off
        else:
            best_len = best_off = 0
        if best_len >= 3:
            lit_len = pos - anchor
            # an over-long literal run cannot trip: _LL_MAX (128K+)
            # exceeds the block size
            lits += data[anchor:pos]
            seqs.append((lit_len, best_off, best_len))
            _rep_update(rep, best_off, lit_len)
            # index the matched region (sparsely for speed)
            stop = pos + best_len
            step = 1 if best_len <= 64 else 3
            while pos < stop and pos <= limit:
                chains.setdefault(_hash4(data, pos), []).append(pos)
                pos += step
            pos = stop
            anchor = stop
        else:
            chains.setdefault(h, []).append(pos)
            pos += 1
    lits += data[anchor:end]
    return seqs, bytes(lits)


# --------------------------------------------------------------------------
# block encoding
# --------------------------------------------------------------------------


def _encode_sequences(seqs: list[tuple[int, int, int]], rep: list) -> bytes:
    """Sequences section: count header + modes byte (predefined x3) + the
    backward bitstream. Bits are accumulated in DECODE-read order into one
    integer, then serialized little-endian under the sentinel bit —
    ``_BackBits`` reads them back top-down in exactly that order. ``rep``
    is the decoder's repeat history at block entry (mutated forward here,
    exactly as the decoder will)."""
    nseq = len(seqs)
    if nseq < 128:
        head = bytes([nseq])
    elif nseq < 0x7F00:
        head = bytes([128 + (nseq >> 8), nseq & 0xFF])
    else:
        head = bytes([255, nseq & 0xFF, (nseq - 0x7F00) >> 8])

    codes = []
    ll_hist: dict[int, int] = {}
    of_hist: dict[int, int] = {}
    ml_hist: dict[int, int] = {}
    for lit_len, offset, match_len in seqs:
        offset_val = _rep_update(rep, offset, lit_len)
        of_code = offset_val.bit_length() - 1
        ll_code = _code_for(lit_len, _LL_BASE)
        ml_code = _code_for(match_len, _ML_BASE)
        ll_hist[ll_code] = ll_hist.get(ll_code, 0) + 1
        of_hist[of_code] = of_hist.get(of_code, 0) + 1
        ml_hist[ml_code] = ml_hist.get(ml_code, 0) + 1
        codes.append(
            (
                ll_code, lit_len - _LL_BASE[ll_code], _LL_BITS[ll_code],
                of_code, offset_val - (1 << of_code),
                ml_code, match_len - _ML_BASE[ml_code], _ML_BITS[ml_code],
            )
        )

    # per-block code tables tuned to the actual histograms: RLE /
    # custom-FSE / predefined, whichever is cheapest to carry (the
    # predefined distributions are generic and cost ~3-5 state bits per
    # symbol more on skewed real streams)
    ll_mode, ll_desc, ll_enc = _choose_seq_table("ll", ll_hist, nseq)
    of_mode, of_desc, of_enc = _choose_seq_table("of", of_hist, nseq)
    ml_mode, ml_desc, ml_enc = _choose_seq_table("ml", ml_hist, nseq)
    head += bytes([(ll_mode << 6) | (of_mode << 4) | (ml_mode << 2)])
    head += ll_desc + of_desc + ml_desc  # decoder reads LL, OF, ML in order

    # walk the sequences BACKWARD choosing FSE cells; remember per-step
    # state bits, then emit everything in decode-read order
    ll_c, of_c, ml_c = codes[-1][0], codes[-1][3], codes[-1][5]
    ll_s = ll_enc.init_state(ll_c)
    of_s = of_enc.init_state(of_c)
    ml_s = ml_enc.init_state(ml_c)
    # updates[i] = bits read AFTER decoding sequence i (decoder order LL, ML, OF)
    updates: list[tuple] = [None] * (len(seqs) - 1)
    for i in range(len(seqs) - 2, -1, -1):
        llc, ofc, mlc = codes[i][0], codes[i][3], codes[i][5]
        # decoder reads ll, ml, of updates in that order going FORWARD from
        # sequence i to i+1; each update consumes the state for sequence i+1
        llv, llb, ll_s = ll_enc.encode(llc, ll_s)
        mlv, mlb, ml_s = ml_enc.encode(mlc, ml_s)
        ofv, ofb, of_s = of_enc.encode(ofc, of_s)
        updates[i] = (llv, llb, mlv, mlb, ofv, ofb)

    acc = 0
    nbits = 0

    def put(v: int, n: int):
        nonlocal acc, nbits
        if n:
            acc = (acc << n) | v
            nbits += n

    put(ll_s, ll_enc.accuracy_log)
    put(of_s, of_enc.accuracy_log)
    put(ml_s, ml_enc.accuracy_log)
    for i, c in enumerate(codes):
        llc, llx, llxb, ofc, ofx, mlc, mlx, mlxb = c
        put(ofx, ofc)
        put(mlx, mlxb)
        put(llx, llxb)
        if i + 1 < len(codes):
            llv, llb, mlv, mlb, ofv, ofb = updates[i]
            put(llv, llb)
            put(mlv, mlb)
            put(ofv, ofb)
    acc |= 1 << nbits  # padding sentinel
    return head + acc.to_bytes((nbits + 8) // 8, "little")


def _raw_literals_section(lits: bytes) -> bytes:
    rs = len(lits)
    if rs < 32:
        return bytes([rs << 3]) + lits
    if rs < 4096:
        return bytes([(rs << 4 | 0x04) & 0xFF, rs >> 4]) + lits
    return bytes([(rs << 4 | 0x0C) & 0xFF, (rs >> 4) & 0xFF, rs >> 12]) + lits


def _compress_block(
    data: bytes, start: int, end: int, chains: dict, rep: list
) -> tuple[int, bytes]:
    """(block_type, payload) for one <=128 KB chunk: compressed when it
    actually shrinks, raw otherwise (also covers the no-matches case —
    a sequences section needs at least one match). ``rep`` mirrors the
    decoder's repeat history: committed when the compressed block is
    emitted, rolled back on the raw fallback (a raw block leaves the
    decoder's history untouched)."""
    snapshot = rep.copy()
    seqs, lits = _find_block_sequences(data, start, end, chains, rep)
    size = end - start
    if seqs:
        # replay offset coding from the block-entry history; the finder's
        # own updates (same rules, same stream) land rep at the same state
        body = _raw_literals_section(lits) + _encode_sequences(seqs, snapshot.copy())
        if len(body) < size:
            return 2, body
    rep[:] = snapshot
    return 0, data[start:end]


def compress(data: bytes) -> bytes:
    """One standard zstd frame (single-segment, frame content size, no
    checksum) containing ``data``."""
    out = bytearray(ZSTD_MAGIC.to_bytes(4, "little"))
    n = len(data)
    # frame header: single-segment (window = content size) + FCS
    if n < 256:
        out += bytes([0x20, n])  # fcs_flag=0 with single_segment: 1 byte
    elif n < 65536 + 256:
        out += bytes([0x60]) + (n - 256).to_bytes(2, "little")
    else:
        out += bytes([0xA0]) + n.to_bytes(4, "little")
    if n == 0:
        out += (1).to_bytes(3, "little")  # last, raw, size 0
        return bytes(out)
    chains: dict = {}
    rep = [1, 4, 8]  # the decoder's initial repeat-offset history
    pos = 0
    while pos < n:
        end = min(pos + BLOCK_MAX, n)
        btype, payload = _compress_block(data, pos, end, chains, rep)
        last = 1 if end == n else 0
        out += (last | (btype << 1) | (len(payload) << 3)).to_bytes(3, "little")
        out += payload
        pos = end
    return bytes(out)
