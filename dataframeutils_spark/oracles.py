"""DuckDB oracle SQL shared fragments.

The driver registers each parquet table as a view (``lineitem``,
``events``, ...) and runs these statements side-by-side with the Spark
queries, comparing row counts, schemas and order-insensitive value
hashes. Float outputs are rounded to the engine-wide significant-digit
contract (:data:`dataframeutils_spark.schema.SIG_DIGITS`) on *both*
sides via the same SQL fragment, so cross-engine aggregation-order noise
(~1e-13 relative) can never flip a hash.
"""

from __future__ import annotations

from dataframeutils_spark.schema import siground_sql as sig

# The standard panel (FIXTURES.md F2 mapping) — must stay in lockstep
# with sources/testdata.py::lineitem_panel.
PANEL_CTE = """
panel AS (
  SELECT CAST(l_shipdate AS DATE) AS date,
         l_returnflag AS grp,
         SUM(l_extendedprice) AS feature_1,
         AVG(l_discount)      AS feature_2,
         SUM(l_quantity)      AS feature_3
  FROM lineitem
  GROUP BY 1, 2
)"""

# Canonical long layout — must stay in lockstep with schema.py::melt_panel.
MELT_CTE = """
melt AS (
  SELECT grp, date, 'feature_1' AS feature, CAST(feature_1 AS DOUBLE) AS value FROM panel
  UNION ALL
  SELECT grp, date, 'feature_2' AS feature, CAST(feature_2 AS DOUBLE) AS value FROM panel
  UNION ALL
  SELECT grp, date, 'feature_3' AS feature, CAST(feature_3 AS DOUBLE) AS value FROM panel
)"""


def with_panel(body: str) -> str:
    return f"WITH {PANEL_CTE}, {MELT_CTE}\n{body}"


DISTRIBUTION_SQL = with_panel(
    f"""
SELECT grp, feature,
       count(value) AS n,
       {sig('avg(value)')} AS mean,
       CASE WHEN count(value) >= 2 THEN {sig('stddev_samp(value)')} END AS std,
       CASE WHEN count(value) >= 3 THEN {sig('skewness(value)')} END AS skew,
       CASE WHEN count(value) >= 4 THEN {sig('kurtosis(value)')} END AS kurtosis
FROM melt
WHERE value IS NOT NULL
GROUP BY grp, feature
"""
)

DISPERSION_SQL = with_panel(
    f"""
SELECT date,
       count(value) AS n_groups,
       {sig('stddev_samp(value)')} AS dispersion
FROM melt
WHERE feature = 'feature_1' AND value IS NOT NULL
GROUP BY date
"""
)

def weighted_bins_sql(bin_size: float = 50.0, max_bins: int = 8) -> str:
    """DuckDB reformulation of the weighted-bin scan on ``events``.

    Same interval-overlap algebra as the Spark kernel: the contribution
    of future event ``e`` to emitting row ``r``'s bin ``k`` is the
    overlap of ``e``'s cumulative-quantity1 interval with the bin's
    window, relative to ``r``'s origin. The running sums use
    ``ROWS UNBOUNDED PRECEDING`` / ``1 PRECEDING`` so both engines build
    identical sequential prefix sums.
    """
    bs = float(bin_size)
    bin_exprs = ",\n       ".join(
        sig(
            f"max(CASE WHEN a.k = {k} AND a.units > 0 THEN a.wsum / a.units END) / 1000.0"
        )
        + f" AS bin_{k}_avg"
        for k in range(1, max_bins + 1)
    )
    return f"""
WITH ev AS (
  SELECT user_id AS id1, event_type AS id2, ts,
         abs(round(value * 1000)) AS q1, round(value * 1000) AS q2, event_id
  FROM events
), ord AS (
  SELECT id1, id2, ts, q1, q2,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY id1, id2) AS grp_n,
         COALESCE(sum(q1) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_lo,
         sum(q1) OVER (w ROWS UNBOUNDED PRECEDING) AS s_hi
  FROM ev
  WINDOW w AS (PARTITION BY id1, id2 ORDER BY ts, event_id)
), emit AS (
  SELECT id1, id2, ts, q1, q2, rn, s_hi AS origin
  FROM ord WHERE rn < grp_n
), contrib AS (
  SELECT r.id1, r.id2, r.rn, b.k, e.q2 AS eq2,
         GREATEST(0, LEAST(e.s_hi - r.origin, b.k * {bs})
                   - GREATEST(e.s_lo - r.origin, (b.k - 1) * {bs})) AS ov
  FROM emit r
  JOIN ord e ON e.id1 = r.id1 AND e.id2 = r.id2 AND e.rn > r.rn
  CROSS JOIN (SELECT unnest(range(1, {max_bins + 1})) AS k) b
), binagg AS (
  SELECT id1, id2, rn, k, sum(ov * eq2) AS wsum, sum(ov) AS units
  FROM contrib GROUP BY id1, id2, rn, k
)
SELECT r.id1 AS id1, r.id2 AS id2, r.ts AS timestamp,
       {sig('r.q1 / 1000.0')} AS quantity1, {sig('r.q2 / 1000.0')} AS quantity2,
       {bin_exprs}
FROM emit r
JOIN binagg a ON a.id1 = r.id1 AND a.id2 = r.id2 AND a.rn = r.rn
GROUP BY r.id1, r.id2, r.ts, r.q1, r.q2, r.rn
"""


AR1_SQL = with_panel(
    f"""
, lagged AS (
  SELECT grp, feature, value,
         lag(value) OVER (PARTITION BY grp, feature ORDER BY date) AS xlag
  FROM melt
),
pairs AS (
  SELECT grp, feature, value, xlag FROM lagged
  WHERE value IS NOT NULL AND xlag IS NOT NULL
),
agg AS (
  SELECT grp, feature,
         count(*) AS n_pairs,
         var_samp(value) AS var_y,
         var_samp(xlag)  AS var_x,
         corr(xlag, value) AS r
  FROM pairs GROUP BY grp, feature
)
SELECT grp, feature, n_pairs,
       CASE WHEN var_y = 0 THEN NULL
            WHEN var_x = 0 THEN 0.0
            ELSE {sig('pow(r, 2)')} END AS ar1_r2
FROM agg
WHERE n_pairs >= 10
"""
)
