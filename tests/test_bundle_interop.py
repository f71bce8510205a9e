"""Interop with the reference's published bundle serializations.

The reference commits `dictionary_maxlength.{json,cbor}` test fixtures
(OpenccNetTests/data/) produced by its own serializers
(DictionaryLib.cs:552-583,1715-1806). Loading them through our interop
path and converting the golden set must match the compiled bundle exactly.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from openccnet_spark import Converter
from openccnet_spark.bundle_interop import decode_cbor, load_reference_bundle
from openccnet_spark.dictionary import SLOTS, load_bundle

from test_convert_goldens import GOLDENS

_FIXTURES = Path("/root/reference/OpenccNetTests/data")

pytestmark = pytest.mark.skipif(
    not (_FIXTURES / "dictionary_maxlength.json").exists(),
    reason="reference fixtures not present",
)


@pytest.fixture(scope="module")
def json_bundle():
    return load_reference_bundle(_FIXTURES / "dictionary_maxlength.json")


@pytest.fixture(scope="module")
def cbor_bundle():
    return load_reference_bundle(_FIXTURES / "dictionary_maxlength.cbor")


def test_cbor_equals_json_slot_for_slot(json_bundle, cbor_bundle):
    for s in SLOTS:
        assert json_bundle.slots[s] == cbor_bundle.slots[s], s


def test_fixture_slots_match_compiled_bundle(json_bundle):
    compiled = load_bundle()
    for s in SLOTS:
        assert json_bundle.slots[s] == compiled.slots[s], s


@pytest.mark.parametrize("which", ["json", "cbor"])
def test_fixture_bundle_converts_goldens(which, json_bundle, cbor_bundle):
    cc = Converter(json_bundle if which == "json" else cbor_bundle)
    for config, punct, inp, expected in GOLDENS:
        assert cc.convert(inp, config, punct) == expected, (config, inp)


def test_cbor_decoder_primitives():
    # spot checks of the self-contained RFC 8949 reader
    assert decode_cbor(bytes.fromhex("00")) == 0
    assert decode_cbor(bytes.fromhex("1819")) == 25
    assert decode_cbor(bytes.fromhex("3863")) == -100
    assert decode_cbor(bytes.fromhex("6449455446")) == "IETF"
    assert decode_cbor(bytes.fromhex("83010203")) == [1, 2, 3]
    assert decode_cbor(bytes.fromhex("a201020304")) == {1: 2, 3: 4}
    assert decode_cbor(bytes.fromhex("f5")) is True
    assert decode_cbor(bytes.fromhex("f6")) is None
    assert decode_cbor(bytes.fromhex("fb3ff199999999999a")) == 1.1
    # indefinite-length array and text string
    assert decode_cbor(bytes.fromhex("9f018202039f0405ffff")) == [1, [2, 3], [4, 5]]
    assert decode_cbor(bytes.fromhex("7f657374726561646d696e67ff")) == "streaming"


# --- zstd: the reference's third bundle format ------------------------------

_ZSTD_FIXTURE = Path("/root/reference/OpenccNetLib/dicts/dictionary_maxlength.zstd")


def _raw_frame(payload: bytes, checksum: bool = False) -> bytes:
    """Handcraft a single-segment zstd frame of one RAW block."""
    fhd = 0x20 | (0x04 if checksum else 0)  # single-segment, FCS 1 byte
    assert len(payload) < 256
    hdr = (len(payload) << 3) | (0 << 1) | 1  # raw, last
    out = (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([fhd, len(payload)])
        + hdr.to_bytes(3, "little")
        + payload
    )
    if checksum:
        out += b"\x00\x00\x00\x00"  # skipped, not verified
    return out


def test_zstd_raw_rle_and_skippable_frames():
    """Container plumbing on handcrafted frames: raw block, RLE block,
    multi-frame concatenation, skippable frames, checksum skip-over."""
    from openccnet_spark.zstd_decode import ZstdError, decompress

    assert decompress(_raw_frame(b"hello zstd")) == b"hello zstd"
    assert decompress(_raw_frame(b"abc", checksum=True)) == b"abc"
    # RLE block: size field = REGENERATED size, one payload byte
    rle = (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([0x20, 7])
        + ((7 << 3) | (1 << 1) | 1).to_bytes(3, "little")
        + b"x"
    )
    assert decompress(rle) == b"xxxxxxx"
    # skippable frame between two real frames
    skip = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(4, "little") + b"???"
    assert decompress(_raw_frame(b"one") + skip + _raw_frame(b"two")) == b"onetwo"
    with pytest.raises(ZstdError, match="bad magic"):
        decompress(b"\x00\x01\x02\x03rest")


@pytest.mark.skipif(not _ZSTD_FIXTURE.exists(), reason="reference zstd fixture not present")
def test_zstd_fixture_decodes_to_valid_bundle_json():
    """The reference's published 450 KB zstd pack must decode through the
    pure-Python RFC 8878 decoder to the same 21-slot JSON document shape
    as the committed JSON fixture."""
    import json

    from openccnet_spark.zstd_decode import decompress

    doc = json.loads(decompress(_ZSTD_FIXTURE.read_bytes()).decode("utf-8"))
    assert set(SLOTS) <= set(doc)
    assert doc["st_characters"]["Dict"]  # non-empty payloads


@pytest.mark.skipif(not _ZSTD_FIXTURE.exists(), reason="reference zstd fixture not present")
def test_zstd_bundle_matches_json_fixture_and_converts(json_bundle):
    """End-to-end: .zstd loads through load_reference_bundle, slot-for-slot
    equals the .json fixture bundle, and converts the golden set."""
    zb = load_reference_bundle(_ZSTD_FIXTURE)
    for s in SLOTS:
        assert zb.slots[s] == json_bundle.slots[s], s
    cc = Converter(zb)
    for config, punct, inp, expected in GOLDENS:
        assert cc.convert(inp, config, punct) == expected, (config, inp)


# --- reference-format WRITERS (round 4) -------------------------------------


@pytest.fixture(scope="module")
def compiled_slots():
    return {s: dict(load_bundle().slots[s]) for s in SLOTS}


def test_written_metadata_matches_reference_fixture(compiled_slots):
    """Our writers must compute the UTF-16-unit derived metadata
    (MaxLength/MinLength/LengthMask/LongLengths/StarterLenMask/Count)
    exactly as the reference serializers did for its committed fixture."""
    import json as _json

    from openccnet_spark.reference_bundle import _doc

    ref = _json.loads((_FIXTURES / "dictionary_maxlength.json").read_text())
    mine = _doc(compiled_slots, "json")
    for slot in SLOTS:
        for field in ("Dict", "MaxLength", "MinLength", "LengthMask", "Count"):
            assert mine[slot][field] == ref[slot][field], (slot, field)
        assert (mine[slot]["LongLengths"] or None) == (ref[slot]["LongLengths"] or None), slot
        assert mine[slot]["StarterLenMask"] == ref[slot]["StarterLenMask"], slot


@pytest.mark.parametrize("fmt,unescape", [
    ("zstd", False), ("cbor", False), ("json", False), ("json", True),
])
def test_written_bundle_roundtrips_and_converts(tmp_path, compiled_slots, fmt, unescape):
    """DictgenCommand parity: every written format must load back through
    load_reference_bundle and convert the golden set identically."""
    from openccnet_spark.reference_bundle import write_reference_bundle

    path = tmp_path / f"b{'_u' if unescape else ''}.{fmt}"
    write_reference_bundle(compiled_slots, path, fmt, unescape=unescape)
    cc = Converter(load_reference_bundle(path))
    for config, punct, inp, expected in GOLDENS:
        assert cc.convert(inp, config, punct) == expected, (config, inp)


def test_written_zstd_is_a_standard_frame(tmp_path, compiled_slots):
    """The raw-block zstd frame must decode via the independent RFC 8878
    decoder to the same compact-JSON payload (multi-block: the bundle is
    ~2.7 MB >> the 128 KiB block size)."""
    import json as _json

    from openccnet_spark.reference_bundle import write_reference_bundle
    from openccnet_spark.zstd_decode import decompress

    path = tmp_path / "b.zstd"
    write_reference_bundle(compiled_slots, path, "zstd")
    doc = _json.loads(decompress(path.read_bytes()))
    assert set(doc) == set(SLOTS)
    assert doc["st_characters"]["Dict"] == compiled_slots["st_characters"]


def test_cbor_encoder_roundtrips_through_own_reader():
    from openccnet_spark.reference_bundle import encode_cbor

    for v in (0, 23, 24, 255, 2**32, 2**64 - 1, -1, -100, "IETF", "你好𠀀",
              b"\x01\x02", [1, [2, "三"], None], {"a": 1, "bb": None, "中": True},
              True, False, None):
        assert decode_cbor(encode_cbor(v)) == v, v


def test_unescape_writes_readable_unicode(tmp_path, compiled_slots):
    from openccnet_spark.reference_bundle import write_reference_bundle

    esc = (tmp_path / "esc.json")
    une = (tmp_path / "une.json")
    write_reference_bundle(compiled_slots, esc, "json")
    write_reference_bundle(compiled_slots, une, "json", unescape=True)
    esc_text, une_text = esc.read_text(), une.read_text()
    assert "\\uD8" not in une_text.upper() and "㐷" in une_text
    assert "㐷" not in esc_text and "\\u3437" in esc_text.replace("\\u3437".lower(), "\\u3437")
    with pytest.raises(ValueError, match="unescape"):
        write_reference_bundle(compiled_slots, tmp_path / "x.cbor", "cbor", unescape=True)


# --- property tests for the round-4 encoders --------------------------------

from hypothesis import given, settings as _hsettings, strategies as st

_hsettings.register_profile(
    "bundle", _hsettings(derandomize=True, deadline=None, max_examples=200)
)
_hsettings.load_profile("bundle")

_cbor_scalars = st.one_of(
    st.integers(min_value=0, max_value=2**64 - 1),
    st.integers(min_value=-(2**64), max_value=-1),
    st.text(max_size=20),
    st.binary(max_size=20),
    st.booleans(),
    st.none(),
)
_cbor_values = st.recursive(
    _cbor_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(st.text(max_size=8), inner, max_size=5),
    ),
    max_leaves=20,
)


@given(_cbor_values)
def test_cbor_encoder_roundtrip_property(value):
    """encode_cbor -> decode_cbor is the identity on the full value domain
    the bundle writer can emit (nested maps/lists, 64-bit ints, unicode
    incl. astral, bytes, bool, null)."""
    from openccnet_spark.reference_bundle import encode_cbor

    assert decode_cbor(encode_cbor(value)) == value


@given(st.binary(max_size=300_000))
@_hsettings(derandomize=True, deadline=None, max_examples=30)
def test_zstd_raw_frame_roundtrip_property(payload):
    """zstd_raw_frame output must decode to the payload through the
    independent RFC 8878 decoder — including multi-block (>128 KiB) and
    empty payloads."""
    from openccnet_spark.reference_bundle import zstd_raw_frame
    from openccnet_spark.zstd_decode import decompress

    assert decompress(zstd_raw_frame(payload)) == payload


@given(st.dictionaries(
    st.text(min_size=1, max_size=6, alphabet=st.one_of(
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4E2F),
        st.characters(min_codepoint=0x20000, max_codepoint=0x2000F),  # astral
        st.characters(min_codepoint=0x41, max_codepoint=0x5A),
    )),
    st.text(max_size=6), max_size=40,
))
def test_slot_metadata_matches_reference_semantics(table):
    """slot_metadata must reproduce the C# semantics on arbitrary tables:
    lengths in UTF-16 units, bit len-1 masks, surrogate-pair starters."""
    from openccnet_spark.reference_bundle import slot_metadata, utf16_len

    md = slot_metadata(table)
    lens = [utf16_len(k) for k in table]
    assert md["MaxLength"] == (max(lens) if lens else 0)
    assert md["MinLength"] == (min(lens) if lens else 0)
    expect_mask = 0
    for n in lens:
        if n <= 64:
            expect_mask |= 1 << (n - 1)
    assert md["LengthMask"] == expect_mask
    if table:
        for k in table:
            starter = k[0]
            assert starter in md["StarterLenMask"]
            n = utf16_len(k)
            if n <= 64:
                assert md["StarterLenMask"][starter] & (1 << (n - 1))
    else:
        assert md["StarterLenMask"] is None


def test_json_escape_uppercasing_skips_literal_backslashes():
    """A slot value containing a LITERAL backslash followed by 'uXXXX'
    text must survive the \\uXXXX-uppercasing pass unchanged (the escape
    scanner must not match across an escaped backslash) — code-review
    finding, round 4."""
    import json as _json

    from openccnet_spark.reference_bundle import _json_bytes

    doc = {"slot": {"Dict": {"k": "a\\u4e2d", "中": "值"}}}
    out = _json_bytes(doc, indent=False, escape=True)
    back = _json.loads(out.decode("utf-8"))
    assert back["slot"]["Dict"]["k"] == "a\\u4e2d"  # byte-for-byte survived
    assert back["slot"]["Dict"]["中"] == "值"
    # real escapes ARE uppercased in the serialized text
    assert b"\\u4E2D" in out


def test_zstd_predefined_ml_long_match():
    """Regression (code-review fuzzing, round 4): the predefined
    Match-Length FSE distribution must carry 1-counts through code 45
    (RFC 8878 ML_defaultNorm) — a truncated table silently decodes the
    wrong match length for predefined-mode frames with long matches.
    The embedded frame is `zstd -c` over b'abcd'*30 (predefined
    sequences, one 116-byte match): the buggy table returned 6,279
    bytes instead of 120."""
    from openccnet_spark.zstd_decode import decompress

    frame = bytes.fromhex("28b52ffd04585d000020616263640100f1d4110186105321")
    assert decompress(frame) == b"abcd" * 30


def test_zstd_fuzz_against_cli():
    """Round-trip a spread of payload shapes through the system zstd
    encoder (skipped when absent) and the pure-Python decoder."""
    import shutil
    import subprocess

    import pytest

    from openccnet_spark.zstd_decode import decompress

    if not shutil.which("zstd"):
        pytest.skip("zstd CLI not available")
    cases = [
        b"", b"x", b"abcd" * 30, b"the quick brown fox " * 50,
        bytes(range(256)) * 40, b"a" * 5000, ("汉字内容测试" * 200).encode(),
        bytes([i % 7 for i in range(3333)]),
    ]
    for level in ("-1", "-9", "-19"):
        for payload in cases:
            comp = subprocess.run(
                ["zstd", "-q", "-c", level], input=payload, capture_output=True
            ).stdout
            assert decompress(comp) == payload, (level, len(payload))
