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
