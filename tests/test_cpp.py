"""C++ kernel tests (auto-built via make; skipped when no toolchain)."""
import numpy as np
import pytest

try:
    from fscl_tpu.dsp.cpp_bindings import cpp_ctc_beam_decode, cpp_yin_f0
    cpp_yin_f0(np.zeros(4096, np.float32))
    HAVE_CPP = True
except Exception:
    HAVE_CPP = False

pytestmark = pytest.mark.skipif(not HAVE_CPP, reason="C++ toolchain missing")


def test_cpp_yin_matches_numpy():
    from fscl_tpu.dsp.pitch import yin_f0
    sr = 22050
    t = np.arange(int(sr * 0.5)) / sr
    wav = np.sin(2 * np.pi * 330.0 * t).astype(np.float32)
    f_cpp = cpp_yin_f0(wav, sr)
    f_np = yin_f0(wav, sr)
    v_cpp, v_np = np.median(f_cpp[f_cpp > 0]), np.median(f_np[f_np > 0])
    assert abs(v_cpp - 330) < 5 and abs(v_np - 330) < 10
    assert abs(v_cpp - v_np) < 5


def test_ctc_beam_collapse_and_blank():
    lp = np.log(np.full((6, 4), 0.01, np.float32))
    for t, c in enumerate([2, 2, 0, 2, 3, 0]):
        lp[t, c] = np.log(0.97)
    toks, score = cpp_ctc_beam_decode(lp, blank=0, beam_width=16)
    assert toks == [2, 2, 3]   # blank separates the repeated 2
    assert score < 0


def test_ctc_beam_greedy_agreement_easy():
    rng = np.random.default_rng(0)
    # strongly peaked distribution -> beam == greedy-collapse
    T, C = 20, 6
    ids = rng.integers(0, C, T)
    lp = np.full((T, C), np.log(0.02 / (C - 1)), np.float32)
    lp[np.arange(T), ids] = np.log(0.98)
    toks, _ = cpp_ctc_beam_decode(lp, blank=0, beam_width=8)
    # greedy collapse
    ref = []
    prev = -1
    for i in ids:
        if i != prev and i != 0:
            ref.append(int(i))
        prev = i
    assert toks == ref
