"""KoG2P golden parity against the reference engine's own test corpus.

tests/fixtures/kog2p_testset_golden.json holds the phone sequences the
reference's vendored KoG2P engine (scripts/KoG2P/g2p.py + rulebook.txt)
produces for every entry of its 475-item scripts/KoG2P/testset.txt (the
engine scores 475/475 against that set's expected pronunciations).
frontend/kog2p.py must match all 475.
"""
import json
import os

from fscl_tpu.frontend.kog2p import g2p_ko, g2p_ko_string

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "kog2p_testset_golden.json")


def test_full_golden_parity():
    rows = json.load(open(FIXTURE, encoding="utf-8"))
    assert len(rows) == 475
    bad = []
    for r in rows:
        mine = " ".join(g2p_ko(r["in"]))
        if mine != r["phones"]:
            bad.append((r["in"], mine, r["phones"]))
    assert not bad, f"{len(bad)} divergences, first 5: {bad[:5]}"


def test_korean_lexicon_builder(tmp_path):
    from fscl_tpu.data.scripts import build_korean_lexicon
    p = tmp_path / "lexicon.txt"
    n = build_korean_lexicon(["안녕하세요 물고기 있다", "물고기 여덟"], str(p))
    assert n == 4
    lex = dict(line.split("\t") for line in
               p.read_text(encoding="utf-8").splitlines())
    assert lex["물고기"] == "mm uu ll kk oo k0 ii"
    assert lex["있다"] == "ii tf tt aa"


def test_basic_shapes():
    assert g2p_ko("한국어") == ["h0", "aa", "nf", "k0", "uu", "k0", "vv"]
    assert g2p_ko_string("안녕") == "aa nf nn yv ng"
    # non-hangul passes through silently
    assert g2p_ko("abc 123") == []
    # liaison and tensification basics
    assert g2p_ko("있다") == ["ii", "tf", "tt", "aa"]
    assert g2p_ko("같이") == ["k0", "aa", "ch", "ii"]
