"""The flagship chronological weighted-bin operator (reference O6).

Semantics (reference ``weighted_bins/weighted_bin_calculator.py:6-173``):
for every row, take all *future* rows of its ``(id1, id2)`` group in
chronological order and greedily pour their ``quantity1`` units into
consecutive fixed-size bins; each bin reports the quantity1-weighted
average of ``quantity2`` over the units it received. The last partial
bin averages over the units actually present (``:136-141``); bins after
exhaustion are NULL (``:148-152``); the final row of each group emits
nothing (``:97-98``). Ties on timestamp keep a stable order via an
explicit tiebreak column (the reference relies on pandas' stable sort,
``:62``).

Implementation — Spark-first, not a port
----------------------------------------
The reference is an O(rows × future × bins) Python loop. Here the
greedy pour is reformulated as *interval overlap on the cumulative
quantity1 axis*: event ``j`` occupies ``[S[j], S[j+1])`` where ``S`` is
the prefix sum of quantity1, and row ``i``'s bin ``k`` is the window
``[S[i+1] + (k-1)·bs, S[i+1] + k·bs)``. The weighted sum poured into any
window is ``W(hi) − W(lo)`` where ``W`` is the piecewise-linear
cumulative ∫q2 d(quantity1) — evaluated for all rows × bin edges at once
with a vectorized ``searchsorted``. Per group of size G the kernel is
O(G·(log G + B)) time / O(G·B) memory (chunked to bound peak memory),
versus the reference's O(G²·B).

Distribution: one shuffle on a *bucket* of the group key —
``groupBy(pmod(hash(id1,id2), B)).applyInPandas`` — NOT on the raw key.
Real event tables have millions of tiny groups; per-group pandas calls
cost ~ms each in Python/Arrow overhead, so the operator would be
overhead-bound long before it is compute-bound. Bucketing coarsens the
Python boundary to B calls total (each vectorized over its groups with
numpy slices), while staying correct because every group lands wholly
in one bucket. The explicit repartition-by-num before the groupBy pins
parallelism: AQE would otherwise coalesce the few-MB shuffle to 1-3
tasks, which is right for JVM work but starves Python-heavy stages.
Skewed keys are diluted by hashing; groups stay independent so the
operator scales linearly with executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataframeutils_spark.schema import nan_to_null

_CHUNK_ROWS = 1 << 18  # bound kernel peak memory to ~chunk×(bins+1) doubles

#: Target rows per bucket when ``num_buckets`` is derived from input size.
#: Each bucket is materialized as ONE pandas DataFrame in a Python worker
#: (5 canonical columns + optional tiebreak ≈ 100-200 bytes/row), so 1M
#: rows keeps the per-task Python footprint in the low hundreds of MB
#: while still amortizing the per-call Arrow/Python overhead.
TARGET_ROWS_PER_BUCKET = 1_000_000

_MAX_BUCKETS = 1 << 20


def derive_num_buckets(
    n_rows: int,
    parallelism: int,
    target_rows_per_bucket: int = TARGET_ROWS_PER_BUCKET,
) -> int:
    """Bucket count for a given input size: ``ceil(rows / target)``,
    floored at the cluster parallelism (never undersubscribe executors)
    and capped at ``_MAX_BUCKETS``.

    Pure function so the scaling law is unit-testable without Spark.
    A single *group* larger than the target still lands wholly in one
    bucket — the groups-whole invariant is what makes bucketing correct —
    so pathological single-group skew is bounded by group size, not by
    this knob; the kernel itself is chunked (``_CHUNK_ROWS``) so only the
    bucket's input rows, not the bins matrix, scale with bucket size.
    """
    if parallelism < 1:
        raise ValueError("parallelism must be >= 1")
    if target_rows_per_bucket < 1:
        raise ValueError("target_rows_per_bucket must be >= 1")
    need = -(-max(n_rows, 0) // target_rows_per_bucket)  # ceil div
    return int(min(_MAX_BUCKETS, max(parallelism, need)))


def _bin_kernel(
    q1: np.ndarray,
    q2: np.ndarray,
    bin_size: float,
    max_bins: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Compute bin averages for one chronologically-ordered group.

    Returns (emit_index, averages[n-1, max_bins]) where emit_index are
    positions (into the ordered arrays) of rows that emit output — all
    but the group's last row.
    """
    n = len(q1)
    if n <= 1:
        return np.empty(0, dtype=np.int64), np.empty((0, max_bins))
    q1 = np.asarray(q1, dtype=np.float64)
    q2 = np.asarray(q2, dtype=np.float64)

    s = np.concatenate(([0.0], np.cumsum(q1)))  # event j occupies [s[j], s[j+1])
    cw = np.concatenate(([0.0], np.cumsum(q1 * q2)))  # W at the breakpoints
    total = s[-1]

    emit = np.arange(n - 1)
    origins = s[1 : n]  # row i's bins start where its own interval ends
    edges = origins[:, None] + np.arange(max_bins + 1)[None, :] * float(bin_size)
    np.minimum(edges, total, out=edges)

    avgs = np.empty((n - 1, max_bins))
    for lo in range(0, n - 1, _CHUNK_ROWS):
        hi = min(lo + _CHUNK_ROWS, n - 1)
        e = edges[lo:hi]
        j = np.clip(np.searchsorted(s, e, side="right") - 1, 0, n - 1)
        w = cw[j] + (e - s[j]) * q2[j]
        poured = np.diff(w, axis=1)
        units = np.diff(e, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            avgs[lo:hi] = np.where(units > 0, poured / units, np.nan)
    return emit, avgs


def calculate_weighted_bins(
    df: DataFrame,
    id1_col: str = "ID1",
    id2_col: str = "ID2",
    timestamp_col: str = "timestamp",
    q1_col: str = "quantity1",
    q2_col: str = "quantity2",
    bin_size: float = 100.0,
    max_bins: int = 10,
    tiebreak_col: str | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """Distributed weighted-bin calculation (same contract as the reference).

    Output: the five canonical columns (original names/types) plus
    ``bin_1_avg .. bin_<max_bins>_avg`` doubles; empty bins are NULL
    (engine NULL policy — the reference used NaN). Extra input columns
    are dropped, as in the reference (``weighted_bin_calculator.py:155-163``).

    ``tiebreak_col``: optional monotonic column that fixes the order of
    timestamp ties (reference semantics = original row position under a
    stable sort; row position is not well-defined for a distributed
    dataset, so callers supply an explicit key, e.g. ``event_id``).
    ``quantity1`` must be non-negative.

    ``num_buckets``: by default (``None``) derived from the input size —
    ``derive_num_buckets(df.count(), parallelism)`` targeting
    ``TARGET_ROWS_PER_BUCKET`` rows per pandas call — so bucket memory
    stays bounded at any scale (the one extra ``count()`` job is a
    column-pruned metadata-cheap scan). Pass an explicit int to skip the
    count, e.g. when the caller already knows the cardinality.
    """
    required = [id1_col, id2_col, timestamp_col, q1_col, q2_col]
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"Missing required columns: {missing}")
    if max_bins < 1:
        raise ValueError("max_bins must be >= 1")
    if not bin_size > 0:
        raise ValueError("bin_size must be > 0")

    bin_cols = [f"bin_{k}_avg" for k in range(1, max_bins + 1)]
    in_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"`{c}` {in_types[c]}" for c in required]
        + [f"{b} double" for b in bin_cols]
    )
    sort_cols = [timestamp_col] + ([tiebreak_col] if tiebreak_col else [])
    select_cols = required + ([tiebreak_col] if tiebreak_col else [])

    def run_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # one pandas call per bucket; numpy slices per group inside
        pdf = pdf.sort_values(
            [id1_col, id2_col, *sort_cols], kind="stable"
        ).reset_index(drop=True)
        n = len(pdf)
        ids1 = pdf[id1_col].to_numpy()
        ids2 = pdf[id2_col].to_numpy()
        change = np.ones(n, dtype=bool)
        change[1:] = (ids1[1:] != ids1[:-1]) | (ids2[1:] != ids2[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        q1 = pdf[q1_col].to_numpy(dtype=np.float64)
        q2 = pdf[q2_col].to_numpy(dtype=np.float64)
        emits: list[np.ndarray] = []
        avg_parts: list[np.ndarray] = []
        for st, en in zip(starts, ends):
            emit, avgs = _bin_kernel(q1[st:en], q2[st:en], float(bin_size), int(max_bins))
            emits.append(emit + st)
            avg_parts.append(avgs)
        emit_all = np.concatenate(emits) if emits else np.empty(0, dtype=np.int64)
        avgs_all = (
            np.concatenate(avg_parts) if avg_parts else np.empty((0, max_bins))
        )
        out = pdf.loc[emit_all, required].reset_index(drop=True)
        for k, b in enumerate(bin_cols):
            out[b] = avgs_all[:, k]
        return out

    par = df.sparkSession.sparkContext.defaultParallelism
    if num_buckets is None:
        num_buckets = derive_num_buckets(df.count(), par)
    elif num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    # Python-stage tasks scale with bucket count (~8 buckets/task) but
    # never drop below cluster parallelism — AQE would otherwise coalesce
    # the few-MB shuffle to 1-3 tasks and starve the pandas stage.
    shuffle_parts = max(par, num_buckets // 8)
    bucket = F.pmod(F.xxhash64(F.col(id1_col), F.col(id2_col)), F.lit(num_buckets))
    result = (
        df.select(*select_cols, bucket.alias("__bucket"))
        .repartition(shuffle_parts, F.col("__bucket"))
        .groupBy("__bucket")
        .applyInPandas(lambda pdf: run_bucket(pdf.drop(columns="__bucket")), schema=out_schema)
    )
    # engine NULL policy: empty bins are SQL NULL, never NaN
    return result.select(
        *required, *[nan_to_null(F.col(b)).alias(b) for b in bin_cols]
    )
