"""Behavioral tests for the round-6 wave-16 operators: graph-level
metrics (assortativity, modularity) and forecast-eval probes
(seasonal-naive backtest, lagged cross-correlation)."""

from __future__ import annotations

from fordgobike_data_pipeline_spark import harness

from .conftest import SF_SMOKE


def test_assortativity_is_valid_correlation(spark):
    out = harness.all_queries()["q_assortativity"](spark, SF_SMOKE).collect()[0]
    assert -1.0 <= out.assortativity <= 1.0
    assert out.n_directed_edges > 0 and out.n_directed_edges % 2 == 0


def test_modularity_bounds(spark):
    out = harness.all_queries()["q_modularity"](spark, SF_SMOKE).collect()[0]
    # Newman modularity is in [-1/2, 1)
    assert -0.5 <= out.modularity < 1.0
    assert out.n_communities > 1


def test_backtest_bias_bounded_by_mae(spark):
    rows = harness.all_queries()["q_backtest_snaive"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # |mean error| <= mean |error| always (triangle inequality)
        assert abs(r.bias) <= r.mae + 1e-9
        assert r.n_eval_days > 0


def test_xcorr_lags_shape_and_range(spark):
    rows = harness.all_queries()["q_xcorr_lags"](spark, SF_SMOKE).collect()
    assert sorted(r.lag for r in rows) == list(range(-3, 4))
    for r in rows:
        if r.r is not None:
            assert -1.0 <= r.r <= 1.0
