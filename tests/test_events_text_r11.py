"""Closed-form unit tests for the r11 session-2 operators:
cohort LTV, event transitions, inter-arrival/burstiness, Gumbel
block-maxima fit (operators/events.py) and document KL / Zipf fit
(operators/text.py)."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest

from dataframeutils_spark.operators import events as events_ops
from dataframeutils_spark.operators import text


def _ev(rows):
    return pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
    )


def test_event_transitions_probs(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "a", 0.0),
        (2, 1, t0 + dt.timedelta(minutes=1), "b", 0.0),
        (3, 1, t0 + dt.timedelta(minutes=2), "a", 0.0),
        (4, 1, t0 + dt.timedelta(minutes=3), "c", 0.0),
        (5, 2, t0, "a", 0.0),
        (6, 2, t0 + dt.timedelta(minutes=1), "b", 0.0),
    ]
    out = events_ops.event_transitions(spark.createDataFrame(_ev(rows))).toPandas()
    by = {(r["cur_type"], r["next_type"]): (r["n"], r["prob"]) for _, r in out.iterrows()}
    assert by[("a", "b")][0] == 2 and by[("a", "b")][1] == pytest.approx(2 / 3)
    assert by[("a", "c")][1] == pytest.approx(1 / 3)
    assert by[("b", "a")][1] == pytest.approx(1.0)
    # conditional rows sum to 1 per cur_type
    sums = out.groupby("cur_type")["prob"].sum()
    for v in sums:
        assert v == pytest.approx(1.0)


def test_interarrival_periodic_is_minus_one(spark):
    """A perfectly periodic stream has sd = 0 → burstiness exactly −1
    (the Goh–Barabási lower bound)."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, t0 + dt.timedelta(seconds=60 * i), "tick", 0.0) for i in range(20)
    ]
    out = events_ops.interarrival_stats(spark.createDataFrame(_ev(rows))).toPandas()
    assert len(out) == 1
    assert float(out["mean_secs"].iloc[0]) == pytest.approx(60.0)
    assert float(out["sd_secs"].iloc[0]) == 0.0
    assert float(out["burstiness"].iloc[0]) == pytest.approx(-1.0)
    assert float(out["cv"].iloc[0]) == 0.0


def test_gumbel_moments_roundtrip(spark):
    """MoM fit recovers μ/β exactly from the block-maxima moments."""
    t0 = dt.datetime(2024, 1, 1)
    # one block per 30 days; put one event per block whose value IS the max
    maxima = [10.0, 14.0, 9.0, 20.0, 12.0, 16.0]
    rows = [
        (i, 1, t0 + dt.timedelta(days=30 * i), "m", v)
        for i, v in enumerate(maxima)
    ]
    out = events_ops.extreme_value_gumbel(spark.createDataFrame(_ev(rows))).toPandas()
    m = sum(maxima) / len(maxima)
    s = math.sqrt(sum((v - m) ** 2 for v in maxima) / (len(maxima) - 1))
    beta = s * math.sqrt(6.0) / math.pi
    mu = m - 0.57721566490153286 * beta
    assert float(out["beta"].iloc[0]) == pytest.approx(beta, rel=1e-5)
    assert float(out["mu"].iloc[0]) == pytest.approx(mu, rel=1e-5)
    rl12 = mu - beta * math.log(-math.log(1 - 1 / 12))
    assert float(out["return_level_12"].iloc[0]) == pytest.approx(rl12, rel=1e-5)


def test_cohort_ltv_cumulative(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "p", 10.0),
        (2, 1, t0 + dt.timedelta(days=8), "p", 5.0),
        (3, 2, t0 + dt.timedelta(days=1), "p", 20.0),
    ]
    out = (
        events_ops.cohort_ltv(spark.createDataFrame(_ev(rows)))
        .toPandas()
        .sort_values("age")
    )
    assert list(out["age"]) == [0, 1]
    assert float(out.iloc[0]["cum_value"]) == pytest.approx(30.0)
    assert float(out.iloc[1]["cum_value"]) == pytest.approx(35.0)
    assert int(out.iloc[0]["cohort_size"]) == 2
    assert float(out.iloc[1]["ltv_per_user"]) == pytest.approx(17.5)


def test_doc_kl_uniform_corpus_is_zero(spark):
    """Docs identical to the corpus distribution have KL exactly 0."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a b c"]})
    )
    out = text.doc_kl_divergence(docs).toPandas()
    assert (out["kl"] == 0.0).all()


def test_doc_kl_detects_outlier(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["a b c d", "a b c d", "a b c d", "zz zz zz zz"],
            }
        )
    )
    out = text.doc_kl_divergence(docs).toPandas().set_index("doc_id")
    assert float(out.loc[4, "kl"]) > float(out.loc[1, "kl"])
    assert float(out.loc[4, "kl"]) > 0.5


def test_zipf_exact_power_law(spark):
    """A corpus whose term counts are exactly c·r^(-1) fits slope −1
    with r² = 1."""
    words = []
    for r in range(1, 21):
        count = round(2520 / r)  # 2520 divisible by 1..10, near-exact tail
        words += [f"w{r:02d}"] * count
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [" ".join(words)]})
    )
    out = text.zipf_fit(docs, top_r=20).toPandas()
    assert int(out["n_terms_used"].iloc[0]) == 20
    assert float(out["slope"].iloc[0]) == pytest.approx(-1.0, abs=0.01)
    assert float(out["r2"].iloc[0]) > 0.999
