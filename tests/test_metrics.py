"""Metrics parity vs sklearn (the reference's metrics provider, train.py:22)."""

import numpy as np
import pytest

from roomnet_tpu.train.metrics import (
    accuracy_score,
    make_stats_entry,
    precision_recall_fscore,
)

sklearn_metrics = pytest.importorskip("sklearn.metrics")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_sklearn(seed):
    rng = np.random.RandomState(seed)
    y_true = rng.randint(0, 6, size=500)
    y_pred = rng.randint(0, 6, size=500)
    assert accuracy_score(y_true, y_pred) == pytest.approx(
        sklearn_metrics.accuracy_score(y_true, y_pred)
    )
    p, r, f, s = precision_recall_fscore(y_true, y_pred)
    sp, sr, sf, ss = sklearn_metrics.precision_recall_fscore_support(
        y_true, y_pred, zero_division=0
    )
    np.testing.assert_allclose(p, sp)
    np.testing.assert_allclose(r, sr)
    np.testing.assert_allclose(f, sf)
    np.testing.assert_array_equal(s, ss)


def test_missing_class_zero_division():
    """A class never predicted gets precision 0, like sklearn zero_division=0."""
    y_true = [0, 0, 1, 1, 2]
    y_pred = [0, 0, 0, 0, 0]
    p, r, f, s = precision_recall_fscore(y_true, y_pred)
    sp, sr, sf, ss = sklearn_metrics.precision_recall_fscore_support(
        y_true, y_pred, zero_division=0
    )
    np.testing.assert_allclose(p, sp)
    np.testing.assert_allclose(r, sr)
    np.testing.assert_allclose(f, sf)


def test_stats_entry_schema():
    """Same keys as all_train_stats.json entries (reference train.py:149-152)."""
    e = make_stats_entry(7, [0, 1, 2, 3, 4, 5], [0, 1, 2, 3, 4, 5])
    assert set(e) == {"step", "accuracy", "precisions", "recalls", "f-scores"}
    assert e["step"] == 7 and e["accuracy"] == 1.0
    assert len(e["precisions"]) == 6
