"""Detailed evaluation metrics: sklearn path vs the numpy fallbacks.

The numpy implementations must agree with sklearn (which is present in dev
environments but optional at runtime — harness/evaluation.py degrades
gracefully without it).
"""
import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")
from sklearn import metrics as sk

from tf2_gnn_tpu.harness import evaluation


def _with_fallback(fn, *args):
    """Run an evaluation fn with the sklearn module masked out."""
    original = evaluation._sk
    evaluation._sk = None
    try:
        return fn(*args)
    finally:
        evaluation._sk = original


def test_regression_metrics_fallback_matches_sklearn():
    rng = np.random.RandomState(0)
    targets = rng.randn(200)
    preds = targets + 0.3 * rng.randn(200)
    a = evaluation.regression_metrics(preds, targets)
    b = _with_fallback(evaluation.regression_metrics, preds, targets)
    for key in ("mae", "mse", "max_err", "expl_var", "r2_score"):
        np.testing.assert_allclose(a[key], b[key], rtol=1e-6, err_msg=key)


def test_binary_metrics_fallback_matches_sklearn():
    rng = np.random.RandomState(1)
    targets = (rng.rand(300) > 0.6).astype(np.float64)
    probs = np.clip(0.35 * targets + 0.4 * rng.rand(300), 0, 1)
    a = evaluation.binary_classification_metrics(probs, targets)
    b = _with_fallback(evaluation.binary_classification_metrics, probs, targets)
    for key in ("acc", "balanced_acc", "precision", "recall", "f1_score",
                "roc_auc", "average_precision"):
        np.testing.assert_allclose(a[key], b[key], rtol=1e-6, atol=1e-9,
                                   err_msg=key)


def test_roc_auc_handles_ties():
    targets = np.array([1.0, 0.0, 1.0, 0.0, 1.0, 0.0])
    scores = np.array([0.5, 0.5, 0.8, 0.2, 0.5, 0.5])  # heavy ties
    ours = evaluation._roc_auc(targets, scores)
    ref = sk.roc_auc_score(targets, scores)
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_degenerate_single_class():
    targets = np.ones(10)
    probs = np.linspace(0.1, 0.9, 10)
    out = _with_fallback(evaluation.binary_classification_metrics, probs, targets)
    assert np.isnan(out["roc_auc"])  # undefined, flagged not crashed
    assert 0.0 <= out["acc"] <= 1.0
