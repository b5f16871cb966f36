"""Eval metric tests: WER/PER, FER, MCD, DPDP decoding."""
import numpy as np
import pytest

from fscl_tpu.eval.dpdp import dpdp_decode, merge_repeats
from fscl_tpu.eval.metrics import (
    frame_error_rate, levenshtein, mel_cepstral_distortion, wer,
)


def test_levenshtein_and_wer():
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "axc") == 1
    assert wer("a b c", "a b c") == 0.0
    assert wer("a b c", "a x c") == 1 / 3
    assert wer("a b c d", "a b") == 0.5


def test_fer_identical_zero():
    seg = [(0.0, 0.1), (0.1, 0.3)]
    assert frame_error_rate("A B", "A B", seg, seg) == 0.0


def test_fer_mismatch():
    seg = [(0.0, 0.2), (0.2, 0.4)]
    # pred: first phoneme covers everything
    err = frame_error_rate("A B", "A A", seg, seg)
    assert abs(err - 0.5) < 1e-6


def test_mcd_zero_and_positive():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(50, 80))
    assert mel_cepstral_distortion(a, a) == 0.0
    assert mel_cepstral_distortion(a, a + 0.1) > 0


def test_dpdp_decode_recovers_segments():
    # 3 clear segments of classes 0,1,2
    T, C = 30, 3
    logp = np.full((T, C), -10.0)
    logp[:10, 0] = -0.1
    logp[10:20, 1] = -0.1
    logp[20:, 2] = -0.1
    segments, labels = dpdp_decode(logp, lam=0.5, max_segment_len=15)
    merged_s, merged_l = merge_repeats(segments, labels)
    assert merged_l == [0, 1, 2]
    assert merged_s[0] == (0, 10) and merged_s[1] == (10, 20)


def test_dpdp_lambda_coarsens():
    rng = np.random.default_rng(0)
    logp = np.log(np.clip(rng.dirichlet(np.ones(5), size=40), 1e-8, 1))
    s_fine, _ = dpdp_decode(logp, lam=0.0, max_segment_len=40)
    s_coarse, _ = dpdp_decode(logp, lam=5.0, max_segment_len=40)
    assert len(s_coarse) <= len(s_fine)


def test_fer_golden_reference_semantics():
    """Golden cases hand-computed with the reference's exact arithmetic
    (fs_error_rate.py:17-31: expand at fp=0.02, truncate a long prediction,
    pad a short one with its LAST frame label)."""
    # gt "a b c" -> durations [2, 3, 1] -> ref_seq a a b b b c (6 frames);
    # pred "a c" -> durations [3, 1] -> a a a c, padded with 'c' to 6:
    # a a a c c c -> correct at frames 0,1,5 -> FER = 0.5
    err = frame_error_rate(
        "a b c", "a c",
        gt_segment=[(0.0, 0.04), (0.04, 0.10), (0.10, 0.12)],
        pred_segment=[(0.0, 0.06), (0.06, 0.08)])
    assert err == pytest.approx(0.5)

    # long prediction is TRUNCATED to the reference length:
    # gt "a" dur [2] -> a a ; pred "a b" durs [2, 2] -> a a b b -> a a
    err = frame_error_rate(
        "a", "a b",
        gt_segment=[(0.0, 0.04)],
        pred_segment=[(0.0, 0.04), (0.04, 0.08)])
    assert err == 0.0

    # padding uses the last PRED frame label, not a blank:
    # gt "a b" durs [1, 2] -> a b b ; pred "b" dur [1] -> b + pad b b ->
    # b b b -> correct at frames 1,2 -> FER = 1/3
    err = frame_error_rate(
        "a b", "b",
        gt_segment=[(0.0, 0.02), (0.02, 0.06)],
        pred_segment=[(0.0, 0.02)])
    assert err == pytest.approx(1.0 / 3.0)


def test_segmentation_boundary_metrics():
    """Boundary recall/precision at 20 ms (the reference's seg_evaluator
    recall, compare_unit.py:109-119)."""
    from fscl_tpu.eval.metrics import (
        segmentation_boundary_metrics, segmentation_recall_over_infos,
    )
    gt = [[0.0, 0.2], [0.2, 0.4], [0.4, 0.6]]
    # perfect boundaries
    m = segmentation_boundary_metrics(gt, gt)
    assert m["recall"] == 1.0 and m["precision"] == 1.0 and m["f1"] == 1.0
    # one boundary shifted within tolerance, one far off
    pred = [[0.0, 0.21], [0.21, 0.5], [0.5, 0.6]]
    m = segmentation_boundary_metrics(gt, pred, tolerance=0.02)
    # boundaries gt {0,.2,.4,.6} pred {0,.21,.5,.6}: 0, .2~.21, .6 match
    assert m["matched"] == 3 and m["n_gt"] == 4
    assert m["recall"] == 3 / 4 and m["precision"] == 3 / 4
    # over-segmentation: recall perfect, precision low
    over = [[i * 0.05, (i + 1) * 0.05] for i in range(12)]
    m = segmentation_boundary_metrics(gt, over, tolerance=0.02)
    assert m["recall"] == 1.0 and m["precision"] < 0.5
    # aggregate
    agg = segmentation_recall_over_infos(
        [{"gt_segment": gt, "pred_segment": pred}])
    assert agg["recall"] == 3 / 4
