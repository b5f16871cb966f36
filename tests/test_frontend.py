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


def test_transliteration_cyrillic_unidecode_parity():
    """convert_to_ascii on Cyrillic matches unidecode's romanization
    (the reference's transliteration_cleaners backend, text/cleaners.py) —
    goldens hand-derived from unidecode's x004 table."""
    from fscl_tpu.frontend.cleaners import (
        convert_to_ascii, transliteration_cleaners,
    )
    goldens = {
        "Москва": "Moskva",
        "Жюри": "Zhiuri",
        "щука": "shchuka",
        "ёж": "iozh",
        "Юрий": "Iurii",
        "объект": "ob'ekt",
        "семья": "sem'ia",
        "Хорошо": "Khorosho",
        "Царь": "Tsar'",
        "Чехов": "Chekhov",
        "Шишкин": "Shishkin",
        "Эхо": "Ekho",
    }
    for src, want in goldens.items():
        assert convert_to_ascii(src) == want, (src, convert_to_ascii(src))
    # full cleaner: lowercased + collapsed
    assert transliteration_cleaners("Москва  слезам") == "moskva slezam"


def test_transliteration_hanzi_pinyin():
    """Common hanzi emit unidecode-format pinyin ("Bei Jing "); AISHELL-3
    style everyday sentences come out pronounceable, not empty."""
    from fscl_tpu.frontend.cleaners import (
        convert_to_ascii, transliteration_cleaners,
    )
    assert convert_to_ascii("北京") == "Bei Jing "
    assert convert_to_ascii("你好") == "Ni Hao "
    # unidecode keeps each syllable's trailing space and does NOT insert
    # one after preceding ASCII ("ABC与" -> "ABCYu ")
    assert transliteration_cleaners("我们是中国人") == "wo men shi zhong guo ren "
    assert transliteration_cleaners("他去北京上学") == "ta qu bei jing shang xue "
    assert transliteration_cleaners("ABC与我") == "abcyu wo "


def test_transliteration_latin_accents_unchanged():
    from fscl_tpu.frontend.cleaners import convert_to_ascii
    assert convert_to_ascii("café naïve Größe") == "cafe naive Groe"
    assert convert_to_ascii("plain ascii 123.") == "plain ascii 123."
