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

from dataframeutils_spark.schema import decround_sql as dec
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
       CASE WHEN count(value) >= 3 THEN {dec('skewness(value)')} END AS skew,
       CASE WHEN count(value) >= 4 THEN {dec('kurtosis(value)')} END AS kurtosis
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
            ELSE {dec('pow(r, 2)')} END AS ar1_r2
FROM agg
WHERE n_pairs >= 10
"""
)

# Pair slices for the cross-feature operators (must match
# cross_feature._pair_frame over the standard panel).
PAIRS = [
    ("feature_1", "feature_2"),
    ("feature_1", "feature_3"),
    ("feature_2", "feature_3"),
]

_PAIR_CTE = "pf AS (\n" + "\n  UNION ALL\n".join(
    f"  SELECT grp, date, '{fa}|{fb}' AS pair, CAST({fa} AS DOUBLE) AS a, CAST({fb} AS DOUBLE) AS b FROM panel"
    for fa, fb in PAIRS
) + "\n)"

MEMORY_SQL = with_panel(
    f"""
, d AS (
  SELECT grp, feature, date, value,
         avg(value) OVER (PARTITION BY grp, feature) AS mean_v
  FROM melt WHERE value IS NOT NULL
), lagged AS (
  SELECT grp, feature, value,
         lag(value, 1)  OVER w AS xlag1,
         lag(value, 5)  OVER w AS xlag5,
         lag(value, 10) OVER w AS xlag10,
         sum(value - mean_v) OVER (w ROWS UNBOUNDED PRECEDING) AS cum_dev
  FROM d
  WINDOW w AS (PARTITION BY grp, feature ORDER BY date)
), agg AS (
  SELECT grp, feature, count(value) AS n,
         corr(value, xlag1)  AS a1,
         corr(value, xlag5)  AS a5,
         corr(value, xlag10) AS a10,
         max(cum_dev) AS cmax, min(cum_dev) AS cmin,
         stddev_samp(value) AS sd
  FROM lagged GROUP BY grp, feature
)
SELECT grp, feature, n,
       {dec('a1')} AS acf_lag1, {dec('a5')} AS acf_lag5, {dec('a10')} AS acf_lag10,
       CASE WHEN n < 20 THEN NULL
            WHEN sd = 0 THEN 0.5
            ELSE {dec('ln((cmax - cmin) / sd) / ln(n)')} END AS hurst_exp
FROM agg WHERE n >= 12
"""
)


# memory_dependence (reference A4, full output): the Ljung–Box p-value
# IS SQL-expressible at the registered lags=10 because the chi² dof is
# EVEN — the survival function has the closed form
# exp(-q/2) · Σ_{i<k/2} (q/2)^i / i!, no incomplete-gamma machinery
# needed. The Q statistic itself is autocorrelation sums (global mean,
# biased normalization — NOT per-segment corr()), built from ten lag
# windows. The acf/hurst columns reuse MEMORY_SQL's expressions; float
# noise between the engine's gamma-series evaluation and the closed
# form (~1e-14) is absorbed by the rounding contract.
_LB_LAGS = 10
_LB_CORRS = ",\n         ".join(
    f"sum((value - m) * (l{k} - m)) AS c{k}" for k in range(1, _LB_LAGS + 1)
)
_LB_LAG_COLS = ",\n         ".join(
    f"lag(value, {k}) OVER w AS l{k}" for k in range(1, _LB_LAGS + 1)
)
_LB_Q = " + ".join(
    f"pow(c{k} / denom, 2) / (n - {k})" for k in range(1, _LB_LAGS + 1)
)
# closed-form chi²(10) survival: k/2 = 5 series terms
_LB_P = (
    "exp(-q / 2) * (1 + (q/2) + pow(q/2, 2)/2 + pow(q/2, 3)/6 "
    "+ pow(q/2, 4)/24)"
)

MEMORY_DEPENDENCE_SQL = with_panel(
    f"""
, d AS (
  SELECT grp, feature, date, value,
         avg(value) OVER (PARTITION BY grp, feature) AS m,
         count(*) OVER (PARTITION BY grp, feature) AS n
  FROM melt WHERE value IS NOT NULL
  QUALIFY n >= 12
), lagged AS (
  SELECT grp, feature, n, m, value,
         lag(value, 1)  OVER w AS xlag1,
         lag(value, 5)  OVER w AS xlag5,
         lag(value, 10) OVER w AS xlag10,
         sum(value - m) OVER (w ROWS UNBOUNDED PRECEDING) AS cum_dev,
         {_LB_LAG_COLS}
  FROM d
  WINDOW w AS (PARTITION BY grp, feature ORDER BY date)
), agg AS (
  SELECT grp, feature, any_value(n) AS n,
         corr(value, xlag1)  AS a1,
         corr(value, xlag5)  AS a5,
         corr(value, xlag10) AS a10,
         max(cum_dev) AS cmax, min(cum_dev) AS cmin,
         stddev_samp(value) AS sd,
         sum((value - m) * (value - m)) AS denom,
         {_LB_CORRS}
  FROM lagged GROUP BY grp, feature
), lb AS (
  SELECT grp, feature, n, a1, a5, a10, cmax, cmin, sd, denom,
         CASE WHEN denom > 0
              THEN n * (n + 2.0) * ({_LB_Q}) END AS q
  FROM agg
)
SELECT grp, feature,
       {dec('a1')} AS acf_lag1, {dec('a5')} AS acf_lag5, {dec('a10')} AS acf_lag10,
       CASE WHEN denom > 0 THEN {dec(_LB_P)} END AS ljungbox_p,
       CASE WHEN n < 20 THEN NULL
            WHEN sd = 0 THEN 0.5
            ELSE {dec('ln((cmax - cmin) / sd) / ln(n)')} END AS hurst_exp
FROM lb
"""
)


# kpss_stationarity: KPSS is closed-form end to end — demeaned
# residuals, lag autocovariance dot products c_i (an idx-offset
# self-join, O(n²) rows at oracle scale), the Hobijn bandwidth
# covlags = trunc(n^(2/9)) → s_hat = s1/s0 → nlags =
# min(trunc(1.1447·(s_hat²)^(1/3)·n^(1/3)), n−1), the Bartlett
# long-run variance, eta = Σ cumsum(r)² / n², and p by piecewise-linear
# interpolation in the published critical-value table clipped to
# [0.01, 0.1] (statsmodels behavior). Multiplication order in the
# bandwidth expression mirrors the engine; the truncation knife edge
# is guarded ENGINE-side (stats.kpss guard_bandwidth_eps). Float
# noise from numpy-dot vs SQL-sum association (~1e-15) is absorbed by
# the fixed-decimal rounding contract; the interpolation is continuous
# at the knots, so near-knot stats cannot flip across engines.
_KPSS_P = (
    "CASE WHEN stat <= 0.347 THEN 0.10 "
    "WHEN stat <= 0.463 THEN 0.10 + ((0.05 - 0.10) / (0.463 - 0.347)) * (stat - 0.347) "
    "WHEN stat <= 0.574 THEN 0.05 + ((0.025 - 0.05) / (0.574 - 0.463)) * (stat - 0.463) "
    "WHEN stat <= 0.739 THEN 0.025 + ((0.01 - 0.025) / (0.739 - 0.574)) * (stat - 0.574) "
    "ELSE 0.01 END"
)

KPSS_SQL = with_panel(
    f"""
, s AS (
  SELECT grp, feature, idx, n,
         value - avg(value) OVER (PARTITION BY grp, feature) AS r
  FROM (
    SELECT grp, feature, value,
           row_number() OVER (PARTITION BY grp, feature ORDER BY date) - 1 AS idx,
           count(*) OVER (PARTITION BY grp, feature) AS n
    FROM melt WHERE value IS NOT NULL
    QUALIFY n >= 10
       AND min(value) OVER (PARTITION BY grp, feature)
           < max(value) OVER (PARTITION BY grp, feature)
  )
), base AS (
  SELECT grp, feature, any_value(n) AS n,
         sum(r * r) AS rr,
         sum(cs * cs) AS eta_num
  FROM (SELECT grp, feature, n, r,
               sum(r) OVER (PARTITION BY grp, feature ORDER BY idx) AS cs
        FROM s)
  GROUP BY grp, feature
), lagp AS (
  SELECT a.grp, a.feature, b.idx - a.idx AS i, sum(a.r * b.r) AS cp
  FROM s a JOIN s b
    ON a.grp = b.grp AND a.feature = b.feature AND b.idx > a.idx
  GROUP BY a.grp, a.feature, b.idx - a.idx
), bw AS (
  SELECT base.grp, base.feature, base.n, base.rr, base.eta_num,
         base.rr / base.n
           + COALESCE(sum(cp / (base.n / 2.0)), 0.0) AS s0,
         COALESCE(sum(i * (cp / (base.n / 2.0))), 0.0) AS s1
  FROM base LEFT JOIN lagp
    ON lagp.grp = base.grp AND lagp.feature = base.feature
   AND lagp.i <= trunc(pow(base.n, 2.0 / 9.0))
  GROUP BY base.grp, base.feature, base.n, base.rr, base.eta_num
), nl AS (
  SELECT *,
         least(CAST(trunc(
             (1.1447 * pow(pow(CASE WHEN s0 <> 0 THEN s1 / s0 ELSE 0.0 END, 2),
                           1.0 / 3.0)) * pow(n, 1.0 / 3.0)
         ) AS BIGINT), n - 1) AS nlags
  FROM bw
), lrv AS (
  SELECT nl.grp, nl.feature, nl.n, nl.nlags,
         (nl.eta_num / (nl.n * nl.n))
           / ((nl.rr + COALESCE(sum(2.0 * cp * (1.0 - i / (nl.nlags + 1.0))), 0.0))
              / nl.n) AS stat
  FROM nl LEFT JOIN lagp
    ON lagp.grp = nl.grp AND lagp.feature = nl.feature AND lagp.i <= nl.nlags
  GROUP BY nl.grp, nl.feature, nl.n, nl.nlags, nl.eta_num, nl.rr
)
SELECT grp, feature, CAST(n AS INT) AS n, CAST(nlags AS INT) AS nlags,
       {dec('stat')} AS kpss_stat,
       {dec(f'least(greatest({_KPSS_P}, 0.01), 0.10)')} AS kpss_p
FROM lrv
"""
)


# frequency_domain (reference A5): the periodogram IS SQL-expressible —
# a DFT is a cos/sin dot product per Fourier frequency, the linear
# detrend is OLS (regr_slope/regr_intercept), and the density scaling /
# one-sided doubling follow functions/stats.py::periodogram exactly
# (boxcar, detrend='constant' demean, p = (c²+s²)/n, ×2 except DC and
# even-n Nyquist). The engine computes the same spectrum via rfft;
# aggregation-order noise (~1e-13 relative) is absorbed by the rounding
# contract, and argmax ties cannot flip across engines unless two bins
# are equal to within that noise (distinct peaks at every test SF).
# O(n·n/2) terms per series — exact-oracle scale only.
FREQUENCY_SQL = with_panel(
    f"""
, gated AS (
  SELECT grp, feature, value,
         row_number() OVER (PARTITION BY grp, feature ORDER BY date) - 1 AS t,
         count(*) OVER (PARTITION BY grp, feature) AS n
  FROM melt WHERE value IS NOT NULL
  QUALIFY n >= 8
), det AS (
  SELECT grp, feature, t, n,
         value - (regr_slope(value, t) OVER w * t
                  + regr_intercept(value, t) OVER w) AS x
  FROM gated WINDOW w AS (PARTITION BY grp, feature)
), dem AS (
  SELECT grp, feature, t, n,
         x - avg(x) OVER (PARTITION BY grp, feature) AS x
  FROM det
), ks AS (
  SELECT unnest(range(1, (SELECT CAST(max(n) // 2 AS BIGINT) FROM gated) + 1)) AS k
), terms AS (
  SELECT grp, feature, n, k,
         sum(x * cos(2 * pi() * k * t / n)) AS c,
         sum(x * sin(2 * pi() * k * t / n)) AS s
  FROM dem JOIN ks ON ks.k <= dem.n // 2
  GROUP BY grp, feature, n, k
), pwr AS (
  SELECT grp, feature, k,
         CAST(k AS DOUBLE) / n AS freq,
         (c * c + s * s) / n
           * (CASE WHEN n % 2 = 0 AND k = n // 2 THEN 1.0 ELSE 2.0 END) AS p
  FROM terms
)
SELECT grp, feature, {dec('freq')} AS dom_freq, {sig('p')} AS dom_power
FROM pwr
QUALIFY row_number() OVER (PARTITION BY grp, feature ORDER BY p DESC, k) = 1
"""
)


def lagged_corr_sql(max_lag: int = 6, min_pairs: int = 10) -> str:
    return with_panel(
        f"""
, {_PAIR_CTE}
, rn AS (
  SELECT *, row_number() OVER (PARTITION BY pair, grp ORDER BY date) AS rn FROM pf
), lags AS (SELECT unnest(range(0, {max_lag + 1})) AS lag)
, joined AS (
  SELECT b.pair, b.grp, l.lag, a_side.a AS a_val, b.b AS b_val
  FROM rn b
  CROSS JOIN lags l
  JOIN rn a_side ON a_side.pair = b.pair AND a_side.grp = b.grp
                AND a_side.rn = b.rn - l.lag
), per_group AS (
  SELECT pair, grp, lag, count(*) AS n_pairs, corr(a_val, b_val) AS c
  FROM joined
  WHERE a_val IS NOT NULL AND b_val IS NOT NULL
  GROUP BY pair, grp, lag
  HAVING count(*) >= {min_pairs}
)
SELECT pair, lag, CAST(count(c) AS BIGINT) AS n_groups, {dec('avg(c)')} AS avg_corr
FROM per_group GROUP BY pair, lag
"""
    )


ROLLING_CORR_SQL = with_panel(
    f"""
, s AS (
  SELECT grp, date,
         corr(CAST(feature_1 AS DOUBLE), CAST(feature_3 AS DOUBLE))
           OVER (PARTITION BY grp ORDER BY date ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS rc,
         row_number() OVER (PARTITION BY grp ORDER BY date) AS rn
  FROM panel
)
SELECT grp, date,
       CASE WHEN isnan(rc) THEN NULL ELSE {dec('rc')} END AS rolling_corr
FROM s WHERE rn >= 10
"""
)

MUTUAL_INFO_SQL = with_panel(
    f"""
, {_PAIR_CTE}
, pn AS (SELECT * FROM pf WHERE a IS NOT NULL AND b IS NOT NULL)
, ext AS (
  SELECT pair, grp, a, b,
         min(a) OVER w AS amin, max(a) OVER w AS amax,
         min(b) OVER w AS bmin, max(b) OVER w AS bmax,
         count(*) OVER w AS n
  FROM pn WINDOW w AS (PARTITION BY pair, grp)
), binned AS (
  SELECT pair, grp, n,
         CASE WHEN amax = amin THEN 5
              ELSE LEAST(CAST(floor((a - amin) / ((amax - amin) / 10)) AS INT), 9) END AS bxx,
         CASE WHEN bmax = bmin THEN 5
              ELSE LEAST(CAST(floor((b - bmin) / ((bmax - bmin) / 10)) AS INT), 9) END AS byy
  FROM ext WHERE n >= 20
), cells AS (
  SELECT pair, grp, n, bxx, byy, count(*) AS cnt
  FROM binned GROUP BY pair, grp, n, bxx, byy
), probs AS (
  SELECT pair, grp, n,
         cnt / CAST(n AS DOUBLE) AS pxy,
         sum(cnt) OVER (PARTITION BY pair, grp, bxx) / CAST(n AS DOUBLE) AS px,
         sum(cnt) OVER (PARTITION BY pair, grp, byy) / CAST(n AS DOUBLE) AS py
  FROM cells
)
SELECT pair, grp, max(n) AS n_pairs,
       {dec('sum(pxy * (ln(pxy + 1e-12) - ln(px + 1e-12) - ln(py + 1e-12)))')} AS mi
FROM probs GROUP BY pair, grp
"""
)

ZSCORE_SQL = with_panel(
    f"""
, d AS (
  SELECT grp, value FROM melt
  WHERE feature = 'feature_1' AND value IS NOT NULL
), scored AS (
  SELECT grp,
         abs((value - avg(value) OVER (PARTITION BY grp))
             / stddev_pop(value) OVER (PARTITION BY grp)) AS z
  FROM d
), agg AS (
  SELECT grp, count(*) AS n,
         CAST(count(*) FILTER (WHERE z > 3) AS BIGINT) AS n_outliers,
         avg(CASE WHEN z > 3 THEN z END) AS avg_out,
         max(z) AS mx, min(z) AS mn
  FROM scored GROUP BY grp
)
SELECT grp, 'feature_1' AS feature, 'zscore' AS method, n_outliers,
       {dec('n_outliers / CAST(n AS DOUBLE)')} AS outlier_rate,
       {dec('coalesce(avg_out, 0.0)')} AS avg_outlier_score,
       {dec('mx')} AS max_outlier_score,
       {dec('mn')} AS min_outlier_score
FROM agg WHERE n >= 10
"""
)


# Deterministic null injection for the forward-fill driver query: null
# out ~1/7 of values by portable hash of (grp:date:feature) — identical
# in both engines, so the fill itself is what the gate checks.
_FFILL_NULLED = """
nulled AS (
  SELECT grp, date, feature,
         CASE WHEN CAST(concat('0x', substr(md5(grp || ':' || date::VARCHAR || ':' || feature), 1, 15)) AS BIGINT) % 7 = 0
              THEN NULL ELSE value END AS value
  FROM melt
)"""

FFILL_SQL = with_panel(
    f""", {_FFILL_NULLED}
SELECT grp, date, feature,
       {dec('value')} AS value,
       {dec('value_filled')} AS value_filled,
       was_filled
FROM (
  SELECT grp, date, feature, value,
         last_value(value IGNORE NULLS) OVER w AS value_filled,
         (value IS NULL AND last_value(value IGNORE NULLS) OVER w IS NOT NULL) AS was_filled
  FROM nulled
  WINDOW w AS (PARTITION BY grp, feature ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
"""
)

RESAMPLE_SQL = with_panel(
    f"""
SELECT grp, feature,
       date_trunc('week', date)::DATE AS bucket,
       count(*) AS n,
       {dec('arg_min(value, date)')} AS open,
       {dec('max(value)')} AS high,
       {dec('min(value)')} AS low,
       {dec('arg_max(value, date)')} AS close,
       {dec('avg(value)')} AS mean
FROM melt
WHERE value IS NOT NULL
GROUP BY 1, 2, 3
"""
)


# ---------------------------------------------------------------------------
# trend & structural-change operators (operators/trend.py)
# ---------------------------------------------------------------------------

# CUSUM change-point: the argmax ranks the decimal-ROUNDED normalized
# statistic (identical pre-ranking round on the engine side), date
# ascending as tiebreak, so a last-ulp aggregation-order difference
# cannot flip the argmax. The Kolmogorov p-value is the 5-term
# alternating series (later terms < 1e-17 for any stat >= 0.4).
_KOL_P = (
    "2 * (exp(-2*stat*stat) - exp(-8*stat*stat) + exp(-18*stat*stat) "
    "- exp(-32*stat*stat) + exp(-50*stat*stat))"
)

CUSUM_SQL = with_panel(
    f"""
, d AS (
  SELECT grp, feature, date, value,
         avg(value) OVER w AS m,
         stddev_samp(value) OVER w AS sd,
         sum(value) OVER w AS tot,
         count(value) OVER w AS n
  FROM melt WHERE value IS NOT NULL
  WINDOW w AS (PARTITION BY grp, feature)
  QUALIFY n >= 30 AND sd > 0
), s AS (
  SELECT grp, feature, date, n, sd, tot,
         sum(value - m) OVER wo AS cs,
         sum(value) OVER wo AS psum,
         count(value) OVER wo AS pcnt
  FROM d
  WINDOW wo AS (PARTITION BY grp, feature ORDER BY date
                ROWS UNBOUNDED PRECEDING)
), st AS (
  SELECT *, {dec('abs(cs) / (sd * sqrt(n))')} AS stat FROM s
), rk AS (
  SELECT *, row_number() OVER (PARTITION BY grp, feature
                               ORDER BY stat DESC, date ASC) AS rk
  FROM st
)
SELECT grp, feature, n, date AS cp_date,
       stat AS cusum_stat,
       {dec(f'greatest(0.0, least(1.0, {_KOL_P}))')} AS p_value,
       {sig('psum / pcnt')} AS mean_before,
       CASE WHEN n > pcnt THEN {sig('(tot - psum) / (n - pcnt)')} END AS mean_after,
       stat > 1.358 AS shift_detected
FROM rk WHERE rk = 1
"""
)

# Classical additive seasonal decomposition, period 7, phase =
# epoch-days mod 7 (a pure integer both engines compute identically).
SEASONAL_SQL = with_panel(
    f"""
, g AS (
  SELECT grp, feature, date, value,
         count(value) OVER (PARTITION BY grp, feature) AS n
  FROM melt WHERE value IS NOT NULL
  QUALIFY n >= 30
), d AS (
  SELECT grp, feature, date, value,
         CASE WHEN count(value) OVER win = 7
              THEN avg(value) OVER win END AS trend,
         ((date - DATE '1970-01-01') % 7 + 7) % 7 AS phase
  FROM g
  WINDOW win AS (PARTITION BY grp, feature ORDER BY date
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), dd AS (
  SELECT *, value - trend AS detr FROM d
), ph AS (
  SELECT grp, feature, phase, avg(detr) AS sraw, count(detr) AS n_obs
  FROM dd GROUP BY grp, feature, phase
), ph2 AS (
  SELECT grp, feature, phase, n_obs,
         sraw - avg(sraw) OVER (PARTITION BY grp, feature) AS seasonal
  FROM ph
), rws AS (
  SELECT dd.grp, dd.feature, dd.detr, dd.value, p.seasonal
  FROM dd JOIN ph2 p
    ON p.grp = dd.grp AND p.feature = dd.feature AND p.phase = dd.phase
  WHERE dd.detr IS NOT NULL
), st AS (
  SELECT grp, feature,
         var_samp(detr - seasonal) AS vr,
         var_samp(detr) AS vd,
         var_samp(value - seasonal) AS vt
  FROM rws GROUP BY grp, feature
)
SELECT p.grp, p.feature, p.phase, p.n_obs,
       {sig('p.seasonal')} AS seasonal,
       {dec('greatest(0.0, 1.0 - s.vr / s.vd)')} AS seasonal_strength,
       {dec('greatest(0.0, 1.0 - s.vr / s.vt)')} AS trend_strength
FROM ph2 p JOIN st s ON s.grp = p.grp AND s.feature = p.feature
"""
)

# Distributed OLS via sufficient statistics: centered normal
# equations from covar_samp/var_samp (identical definitions in both
# engines), solved by Cramer on the 2x2 covariance system.
OLS_SQL = f"""
WITH {PANEL_CTE},
base AS (
  SELECT grp, CAST(feature_3 AS DOUBLE) AS y,
         CAST(feature_1 AS DOUBLE) AS x1, CAST(feature_2 AS DOUBLE) AS x2
  FROM panel
  WHERE feature_1 IS NOT NULL AND feature_2 IS NOT NULL AND feature_3 IS NOT NULL
), agg AS (
  SELECT grp, count(*) AS n, avg(y) AS my, avg(x1) AS m1, avg(x2) AS m2,
         var_samp(x1) AS v1, var_samp(x2) AS v2, var_samp(y) AS vy,
         covar_samp(x1, x2) AS c12, covar_samp(x1, y) AS c1y,
         covar_samp(x2, y) AS c2y
  FROM base GROUP BY grp
), s AS (
  SELECT grp, n, my, m1, m2,
         v1 * (n - 1) AS s11, v2 * (n - 1) AS s22, vy * (n - 1) AS syy,
         c12 * (n - 1) AS s12, c1y * (n - 1) AS s1y, c2y * (n - 1) AS s2y
  FROM agg
), sol AS (
  SELECT *, s11 * s22 - s12 * s12 AS det FROM s
), b AS (
  SELECT *,
         (s1y * s22 - s2y * s12) / det AS beta1,
         (s2y * s11 - s1y * s12) / det AS beta2
  FROM sol WHERE abs(det) > 0 AND n > 3
), e AS (
  -- clamp mirrors the Spark side: near-perfect fits can round sse a
  -- hair below 0, and DuckDB sqrt(negative) ERRORS where Spark NaNs
  SELECT *, greatest(0.0, syy - beta1 * s1y - beta2 * s2y) AS sse FROM b
), f AS (
  SELECT *, sse / (n - 3) AS sigma2 FROM e
), g2 AS (
  SELECT *, sqrt(sigma2 * s22 / det) AS se1, sqrt(sigma2 * s11 / det) AS se2
  FROM f
)
SELECT grp, n,
       {sig('my - beta1 * m1 - beta2 * m2')} AS beta0,
       {sig('beta1')} AS beta1,
       {sig('beta2')} AS beta2,
       {sig('se1')} AS se_beta1,
       {sig('se2')} AS se_beta2,
       {dec('CASE WHEN se1 > 0 THEN beta1 / se1 END')} AS t_beta1,
       {dec('CASE WHEN se2 > 0 THEN beta2 / se2 END')} AS t_beta2,
       {dec('1.0 - sse / syy')} AS r2
FROM g2
"""

# Theil-Sen robust slope over the deterministic hash-sampled subset
# (portable_hash60 predicate, P = ceil(n/320)); quantile_cont matches
# Spark percentile()'s (n-1)*q linear interpolation.
_TS_HASH = (
    "CAST(concat('0x', substr(md5(grp || '|' || feature || '|' || "
    "date::VARCHAR), 1, 15)) AS BIGINT)"
)

THEILSEN_SQL = with_panel(
    f"""
, g AS (
  SELECT grp, feature, date,
         CAST(date - DATE '1970-01-01' AS DOUBLE) AS x, value AS v,
         count(value) OVER (PARTITION BY grp, feature) AS n
  FROM melt WHERE value IS NOT NULL
  QUALIFY n >= 30
), samp AS (
  SELECT * FROM g
  WHERE {_TS_HASH} % ((n + 319) // 320) = 0
), med AS (
  SELECT a.grp, a.feature, any_value(a.n) AS n, count(*) AS n_pairs,
         quantile_cont((b.v - a.v) / (b.x - a.x), 0.5) AS slope
  FROM samp a JOIN samp b
    ON b.grp = a.grp AND b.feature = a.feature AND b.x > a.x
  GROUP BY a.grp, a.feature
), inter AS (
  SELECT s.grp, s.feature, count(*) AS n_sampled,
         quantile_cont(s.v - m.slope * s.x, 0.5) AS intercept
  FROM samp s JOIN med m ON m.grp = s.grp AND m.feature = s.feature
  GROUP BY s.grp, s.feature
)
SELECT m.grp, m.feature, m.n, i.n_sampled, m.n_pairs,
       {sig('m.slope')} AS slope,
       {sig('i.intercept')} AS intercept
FROM med m JOIN inter i ON i.grp = m.grp AND i.feature = m.feature
"""
)


# Two-sample KS drift test (operators/trend.py ks_two_sample): values
# decimal-rounded BEFORE grouping (tie structure engine-identical),
# Stephens finite-sample lambda, 5-term Kolmogorov series.
_KS_P = (
    "2 * (exp(-2*lam*lam) - exp(-8*lam*lam) + exp(-18*lam*lam) "
    "- exp(-32*lam*lam) + exp(-50*lam*lam))"
)

KS_TWO_SAMPLE_SQL = with_panel(
    f"""
, g AS (
  SELECT grp, feature, value,
         (date - DATE '1970-01-01') AS day,
         count(value) OVER (PARTITION BY grp, feature) AS n,
         min(date - DATE '1970-01-01') OVER (PARTITION BY grp, feature)
           + max(date - DATE '1970-01-01') OVER (PARTITION BY grp, feature) AS mm
  FROM melt WHERE value IS NOT NULL
  QUALIFY n >= 40
), sided AS (
  SELECT grp, feature,
         CASE WHEN day * 2 < mm THEN 1 ELSE 0 END AS side,
         {dec('value')} AS rv
  FROM g
), cell AS (
  SELECT grp, feature, rv,
         sum(side) AS c1, sum(1 - side) AS c2
  FROM sided GROUP BY grp, feature, rv
), scored AS (
  SELECT grp, feature,
         sum(c1) OVER wg AS n1, sum(c2) OVER wg AS n2,
         sum(c1) OVER wv AS cum1, sum(c2) OVER wv AS cum2
  FROM cell
  WINDOW wg AS (PARTITION BY grp, feature),
         wv AS (PARTITION BY grp, feature ORDER BY rv
                ROWS UNBOUNDED PRECEDING)
), agg AS (
  SELECT grp, feature, any_value(n1) AS n1, any_value(n2) AS n2,
         {dec('max(abs(cum1 / CAST(n1 AS DOUBLE) - cum2 / CAST(n2 AS DOUBLE)))')} AS ks_stat
  FROM scored WHERE n1 > 0 AND n2 > 0
  GROUP BY grp, feature
), lamt AS (
  SELECT *,
         (sqrt(n1 * CAST(n2 AS DOUBLE) / (n1 + n2)) + 0.12
          + 0.11 / sqrt(n1 * CAST(n2 AS DOUBLE) / (n1 + n2))) * ks_stat AS lam
  FROM agg
), pt AS (
  SELECT *, {dec(f'greatest(0.0, least(1.0, {_KS_P}))')} AS p_value FROM lamt
)
SELECT grp, feature, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ks_stat, p_value, p_value < 0.05 AS drift_detected
FROM pt
"""
)


# AR(3) Yule-Walker + PACF — Cramer's rule over the decimal-rounded
# first three autocorrelations (identical IEEE arithmetic both engines)
_YW_DET = "((1.0 - a*a) - a*(a - a*b) + b*(a*a - b))"
_YW_D1 = "(a*(1.0 - a*a) - a*(b - a*c) + b*(a*b - c))"
_YW_D2 = "((b - a*c) - a*(a - a*b) + b*(a*c - b*b))"
_YW_D3 = "((c - a*b) - a*(a*c - b*b) + a*(a*a - b))"
_YW_OK = f"a IS NOT NULL AND b IS NOT NULL AND c IS NOT NULL AND abs({_YW_DET}) > 1e-12"
_YW_P1 = f"CASE WHEN {_YW_OK} THEN {_YW_D1} / {_YW_DET} END"
_YW_P2 = f"CASE WHEN {_YW_OK} THEN {_YW_D2} / {_YW_DET} END"
_YW_P3 = f"CASE WHEN {_YW_OK} THEN {_YW_D3} / {_YW_DET} END"

AR_YULE_WALKER_SQL = with_panel(
    f"""
, d AS (
  SELECT grp, feature, date, value FROM melt WHERE value IS NOT NULL
), lagged AS (
  SELECT grp, feature, value,
         lag(value, 1) OVER w AS xlag1,
         lag(value, 2) OVER w AS xlag2,
         lag(value, 3) OVER w AS xlag3
  FROM d
  WINDOW w AS (PARTITION BY grp, feature ORDER BY date)
), agg AS (
  SELECT grp, feature, count(value) AS n,
         {dec('corr(value, xlag1)')} AS a,
         {dec('corr(value, xlag2)')} AS b,
         {dec('corr(value, xlag3)')} AS c
  FROM lagged GROUP BY grp, feature
)
SELECT grp, feature, CAST(n AS BIGINT) AS n,
       a AS acf1, b AS acf2, c AS acf3,
       {dec(_YW_P1)} AS phi1,
       {dec(_YW_P2)} AS phi2,
       {dec(_YW_P3)} AS phi3,
       {dec("CASE WHEN a IS NOT NULL AND b IS NOT NULL AND abs(1.0 - a*a) > 1e-12 THEN (b - a*a) / (1.0 - a*a) END")} AS pacf2,
       {dec(f"CASE WHEN {_YW_OK} THEN 1.0 - (({_YW_P1}) * a + ({_YW_P2}) * b + ({_YW_P3}) * c) END")} AS resid_ratio
FROM agg WHERE n >= 12
"""
)
