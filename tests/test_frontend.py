"""Frontend tests: symbol-table parity with the reference data + cleaners."""
import importlib
import importlib.util
import sys

import pytest

REF = "/root/reference"


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_symbol_tables_match_reference_data():
    sym = importlib.import_module("fscl_tpu.frontend.symbols")
    try:
        cmudict = _load_ref("ref_cmudict", f"{REF}/text/cmudict.py")
        pinyin = _load_ref("ref_pinyin", f"{REF}/text/pinyin.py")
    except FileNotFoundError:
        pytest.skip("reference not mounted")
    assert sym.arpabet_valid_symbols == cmudict.valid_symbols
    assert sym.pinyin_valid_symbols == pinyin.valid_symbols
    assert len(sym.symbols) == 361
    assert sym.symbols[0] == "_"


def test_text_to_sequence_roundtrip():
    from fscl_tpu.frontend import sequence_to_text, text_to_sequence
    seq = text_to_sequence("{HH AH0 L OW1} world", ["english_cleaners"], "en")
    assert seq, "non-empty sequence"
    text = sequence_to_text(seq, "en")
    assert "HH" in text and "world" in text


def test_pad_never_produced():
    from fscl_tpu.frontend import text_to_sequence
    seq = text_to_sequence("_abc_", ["basic_cleaners"], "en")
    assert 0 not in seq


def test_number_normalization():
    from fscl_tpu.frontend.numbers_en import normalize_numbers
    assert normalize_numbers("1984") == "nineteen eighty-four"
    assert normalize_numbers("$3.50") == "three dollars, fifty cents"
    assert normalize_numbers("2nd") == "second"
    assert normalize_numbers("13") == "thirteen"


def test_cleaners():
    from fscl_tpu.frontend.cleaners import english_cleaners, transliteration_cleaners
    assert english_cleaners("Dr.  Smith") == "doctor smith"
    assert transliteration_cleaners("Crème BRÛLÉE") == "creme brulee"


def test_unit_symbol_registration():
    from fscl_tpu.frontend import LANG_ID2SYMBOLS, register_unit_symbols, n_symbols
    from fscl_tpu.frontend.symbols import common_symbols
    register_unit_symbols("hubert-unit-64", 64)
    assert n_symbols("hubert-unit-64") == len(common_symbols) + 64
    assert LANG_ID2SYMBOLS["hubert-unit-64"][len(common_symbols)] == "0"
