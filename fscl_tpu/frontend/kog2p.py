"""Korean grapheme-to-phoneme conversion.

Capability equivalent of the reference's vendored KoG2P rule engine
(scripts/KoG2P/g2p.py:1-345): hangul syllables are decomposed into
onset/nucleus/coda jamo by Unicode arithmetic and mapped to the KoG2P phone
inventory (k0/kk/kh..., aa/qq/ya...), with the core connected-speech rules
applied across syllable boundaries: liaison (coda resyllabification before
vowel onsets), nasal assimilation, coda neutralization, aspiration with
/h/, and tensification after obstruent codas.

This is an independent implementation of standard Korean phonology — rule
coverage focuses on the phenomena exercised by TTS text (the reference's
engine has additional rare-cluster rules).
"""
from __future__ import annotations

from typing import List

# KoG2P phone symbols, indexed by jamo position
ONSETS = [
    "k0", "kk", "nn", "t0", "tt", "rr", "mm", "p0", "pp",
    "s0", "ss", "oh", "c0", "cc", "ch", "kh", "th", "ph", "h0",
]  # "oh" = empty onset (ㅇ)
NUCLEI = [
    "aa", "qq", "ya", "yq", "vv", "ee", "yv", "ye", "oo", "wa",
    "wq", "wo", "yo", "uu", "wv", "we", "wi", "yu", "xx", "xi", "ii",
]
# coda jamo -> (neutralized coda phone, liaison onset phone)
CODAS = {
    0: (None, None),
    1: ("kf", "k0"), 2: ("kf", "kk"), 3: ("kf", "ks"),
    4: ("nf", "nn"), 5: ("nf", "nc"), 6: ("nf", "nh"),
    7: ("tf", "t0"), 8: ("ll", "rr"), 9: ("kf", "lk"), 10: ("mf", "lm"),
    11: ("lf", "lb"), 12: ("lf", "ls"), 13: ("lf", "lt"), 14: ("pf", "lp"),
    15: ("lf", "lh"), 16: ("mf", "mm"), 17: ("pf", "p0"), 18: ("pf", "ps"),
    19: ("tf", "s0"), 20: ("tf", "ss"), 21: ("ng", "ng"),
    22: ("tf", "c0"), 23: ("tf", "ch"), 24: ("kf", "kh"), 25: ("tf", "th"),
    26: ("pf", "ph"), 27: ("tf", "h0"),
}
# complex liaison onsets -> (kept coda, onset)
_COMPLEX = {
    "ks": ("kf", "s0"), "nc": ("nf", "c0"), "nh": ("nf", "h0"),
    "lk": ("ll", "k0"), "lm": ("ll", "mm"), "lb": ("ll", "p0"),
    "ls": ("ll", "s0"), "lt": ("ll", "th"), "lp": ("ll", "ph"),
    "lh": ("ll", "h0"),
}

_TENSE = {"k0": "kk", "t0": "tt", "p0": "pp", "s0": "ss", "c0": "cc"}
_ASPIRATE = {"k0": "kh", "t0": "th", "p0": "ph", "c0": "ch",
             "kk": "kh", "tt": "th", "pp": "ph", "cc": "ch"}
_NASALIZE_CODA = {"kf": "ng", "tf": "nf", "pf": "mf"}
_OBSTRUENT_CODAS = {"kf", "tf", "pf"}
_NASAL_ONSETS = {"nn", "mm"}


def decompose(ch: str):
    """Hangul syllable -> (onset idx, nucleus idx, coda idx) or None."""
    code = ord(ch) - 0xAC00
    if not 0 <= code < 11172:
        return None
    onset, rest = divmod(code, 588)
    nucleus, coda = divmod(rest, 28)
    return onset, nucleus, coda


def g2p_ko(text: str) -> List[str]:
    """Korean text -> KoG2P phone list."""
    # decompose into per-syllable (onset, nucleus, coda-phone-pair)
    sylls = []
    for ch in text:
        d = decompose(ch)
        if d is None:
            if ch.strip() == "" and sylls:
                sylls.append(None)   # word boundary marker
            continue
        sylls.append(d)

    phones: List[str] = []
    n = len(sylls)
    for i, s in enumerate(sylls):
        if s is None:
            continue
        onset_i, nucleus_i, coda_i = s
        onset = ONSETS[onset_i]
        coda, liaison = CODAS[coda_i]

        nxt = sylls[i + 1] if i + 1 < n else None
        nxt_onset = ONSETS[nxt[0]] if nxt is not None else None

        # onset realization
        if onset == "oh":
            onset = None                      # bare vowel
        if onset == "h0" and phones and phones[-1] in _OBSTRUENT_CODAS:
            # aspiration: obstruent coda + h -> aspirated onset
            prev_coda = phones.pop()
            base = {"kf": "k0", "tf": "t0", "pf": "p0"}[prev_coda]
            onset = _ASPIRATE[base]
        elif (onset in _TENSE and phones
              and phones[-1] in _OBSTRUENT_CODAS):
            onset = _TENSE[onset]             # post-obstruent tensification

        if onset:
            phones.append(onset)
        phones.append(NUCLEI[nucleus_i])

        # coda realization
        if coda is None:
            continue
        if (liaison in ("h0", "nh", "lh") and nxt is not None
                and ONSETS[nxt[0]] in ("k0", "t0", "c0")):
            # coda-h aspiration: joh-ta -> jo-tha (keep sonorant part of
            # nh/lh as the coda)
            if liaison == "nh":
                phones.append("nf")
            elif liaison == "lh":
                phones.append("ll")
            sylls[i + 1] = (
                _onset_index(_ASPIRATE[ONSETS[nxt[0]]]), nxt[1], nxt[2])
            continue
        if nxt is not None and ONSETS[nxt[0]] == "oh":
            # liaison: coda resyllabifies as next onset
            if liaison in _COMPLEX:
                kept, lia = _COMPLEX[liaison]
                phones.append(kept)
                sylls[i + 1] = (_onset_index(lia), nxt[1], nxt[2])
            else:
                sylls[i + 1] = (_onset_index(liaison), nxt[1], nxt[2])
            continue
        if (nxt_onset in _NASAL_ONSETS and coda in _NASALIZE_CODA):
            coda = _NASALIZE_CODA[coda]       # nasal assimilation
        if nxt_onset == "rr" and coda == "nf":
            coda = "ll"                       # n + r -> l l (lateralization)
        phones.append(coda)
    return phones


def _onset_index(phone: str) -> int:
    return ONSETS.index(phone if phone != "oh" else "oh")


def g2p_ko_string(text: str) -> str:
    return " ".join(g2p_ko(text))
