"""zstd COMPRESSOR tests (zstd_encode): self round-trip through our own
RFC 8878 decoder, independent verification by the system zstd CLI, and the
size target vs the reference's level-19 artifact."""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from openccnet_spark.zstd_decode import decompress
from openccnet_spark.zstd_encode import BLOCK_MAX, compress

_ZSTD_CLI = shutil.which("zstd") or (
    "/root/miniconda/bin/zstd" if Path("/root/miniconda/bin/zstd").exists() else None
)
_REF_FIXTURE = Path("/root/reference/OpenccNetLib/dicts/dictionary_maxlength.zstd")


def _cli_decompress(data: bytes, tmp_path: Path) -> bytes:
    src = tmp_path / "x.zst"
    dst = tmp_path / "x.out"
    src.write_bytes(data)
    r = subprocess.run(
        [_ZSTD_CLI, "-d", "-f", str(src), "-o", str(dst)],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
    return dst.read_bytes()


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"a",
        b"abc",
        b"abcabcabcabcabcabcabcabc",
        bytes(range(256)) * 3,
        b"x" * 100_000,  # long RLE-ish run -> rep offsets + long matches
        b"the quick brown fox " * 5_000,
        ("{\"k\": \"v\", \"n\": 1}\n" * 9_000).encode(),  # JSON-shaped
    ],
)
def test_round_trip_self(payload):
    assert decompress(compress(payload)) == payload


def test_block_boundary_sizes():
    base = bytes(range(251)) * 600  # weakly compressible
    for n in (BLOCK_MAX - 1, BLOCK_MAX, BLOCK_MAX + 1, 2 * BLOCK_MAX + 17):
        payload = (base * (n // len(base) + 1))[:n]
        assert decompress(compress(payload)) == payload


def test_incompressible_falls_back_to_raw_blocks():
    import random

    rnd = random.Random(99)
    payload = bytes(rnd.randrange(256) for _ in range(150_000))
    z = compress(payload)
    assert decompress(z) == payload
    # stored overhead only: 12-byte-ish frame shell + 3 bytes per block
    assert len(z) < len(payload) + 64


def test_cross_block_matches_and_rep_offsets():
    # page 2 is a byte-for-byte replay of page 1 -> one giant cross-block
    # match; the repeated line stride exercises the repeat-offset history
    line = "0123456789abcdef" * 4 + "\n"
    page = (line * 2_000).encode()
    payload = page + page
    z = compress(payload)
    assert decompress(z) == payload
    assert len(z) < len(payload) // 20  # must really compress


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=4096))
def test_round_trip_property(payload):
    assert decompress(compress(payload)) == payload


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.sampled_from([b"foo", b"bar", b"bazz", b"\xe4\xb8\xad\xe6\x96\x87", b" "]),
        max_size=4000,
    )
)
def test_round_trip_token_soup(tokens):
    payload = b"".join(tokens)
    assert decompress(compress(payload)) == payload


@pytest.mark.skipif(_ZSTD_CLI is None, reason="zstd CLI not present")
def test_cli_accepts_our_frames(tmp_path):
    for payload in [
        b"",
        b"hello zstd" * 1_000,
        bytes(range(256)) * 700,
        ("{\"key\": \"value\"}\n" * 12_000).encode(),
    ]:
        assert _cli_decompress(compress(payload), tmp_path) == payload


@pytest.mark.skipif(
    _ZSTD_CLI is None or not _REF_FIXTURE.exists(),
    reason="zstd CLI or reference fixture not present",
)
def test_reference_bundle_size_target(tmp_path):
    """Recompressing the reference bundle's own JSON payload must stay
    within 1.3x of the reference's level-19 artifact (r6 measured 1.22
    with Huffman literals + the rep/literal-cost parse), decoding
    byte-exactly through BOTH our decoder and the system CLI."""
    ref = _REF_FIXTURE.read_bytes()
    data = decompress(ref)
    z = compress(data)
    assert decompress(z) == data
    assert _cli_decompress(z, tmp_path) == data
    ratio = len(z) / len(ref)
    assert ratio <= 1.3, f"compressed {len(z)} vs reference {len(ref)} ({ratio:.2f}x)"


def test_written_bundle_is_compressed(tmp_path):
    """write_reference_bundle(fmt='zstd') now really compresses: the
    artifact must be much smaller than its JSON payload and decode to it."""
    from openccnet_spark.reference_bundle import (
        REFERENCE_SLOT_ORDER,
        write_reference_bundle,
    )

    slots = {name: {} for name in REFERENCE_SLOT_ORDER}
    slots["st_characters"] = {f"字{i}": f"字{i}x" for i in range(500)}
    slots["st_phrases"] = {f"词组{i}": f"詞組{i}" for i in range(500)}
    path = tmp_path / "b.zstd"
    write_reference_bundle(slots, path, "zstd")
    blob = path.read_bytes()
    from openccnet_spark.reference_bundle import _doc, _json_bytes

    payload = _json_bytes(_doc(slots, "json"), indent=False, escape=True)
    assert decompress(blob) == payload
    assert len(blob) < len(payload) // 2
    if _ZSTD_CLI:
        assert _cli_decompress(blob, tmp_path) == payload
