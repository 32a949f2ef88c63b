"""Record linkage / entity resolution: fuzzy joins at corpus scale.

The classic pipeline — BLOCK, VERIFY, RESOLVE:

* :func:`deletion_variants` — deletion-neighborhood blocking keys
  (the FastSS / SymSpell method, Bocek et al. 2007): every string
  emits itself plus each single-character deletion. Two strings
  within edit distance 1 ALWAYS share a key (proof in the
  docstring), so the candidate join is exact-complete — unlike
  prefix blocking, which degenerates to one giant block on
  constant-prefix identifiers ("Customer#0000...") and misses
  nothing only by comparing everything.
* :func:`fuzzy_match_pairs` — candidate join on the shared keys,
  verified with a single native ``levenshtein`` call (identical
  classic edit-distance in Spark and DuckDB).
* :func:`resolve_entities` — connected components over the verified
  match edges (reusing the dedup pointer-doubling propagation):
  entity id = min node id in the component, the keep-first policy.

Scale notes (100 TB): keys per row = name length + 1 (bounded by the
identifier width, not the corpus), so the blocking table is O(rows ×
len); the join exchanges 17-char keys, never the full records; the
verify step is one JVM levenshtein per CANDIDATE pair (a few per
row), never per cross-pair. The resolve step is the same bounded
label propagation the dedup family runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataframeutils_spark.operators.dedup import (
    connected_components,
    portable_hash60,
    portable_hash60_sql,
)


def deterministic_corruption(
    df: DataFrame, id_col: str, name_col: str
) -> DataFrame:
    """A reproducible 'dirty feed': delete ONE character of each name
    at a hash-chosen position (0-based ``portable_hash60(name) mod
    len``). Both engines compute the identical position, so the
    corrupted table — and everything downstream — stays exact-gateable.
    Returns (id, name)."""
    name = F.col(name_col)
    pos = F.pmod(portable_hash60(name), F.length(name))
    return df.select(
        F.col(id_col).alias("id"),
        F.concat(
            name.substr(F.lit(1), pos),
            name.substr(pos + F.lit(2), F.length(name)),
        ).alias("name"),
    )


def deterministic_corruption_sql(table: str, id_expr: str, name_expr: str) -> str:
    h = portable_hash60_sql(name_expr)
    pos = f"({h} % length({name_expr}))"
    return f"""
  SELECT {id_expr} AS id,
         substr({name_expr}, 1, {pos})
           || substr({name_expr}, {pos} + 2) AS name
  FROM {table}
"""


def deletion_variants(df: DataFrame, id_col: str, name_col: str) -> DataFrame:
    """Deletion-neighborhood blocking keys: (id, name, key) where key
    ranges over {name} ∪ del1(name).

    Completeness for edit distance ≤ 1: if t = s (share s); if t is s
    minus one char, t ∈ del1(s) and t = t; if t substitutes position
    p of s, deleting p from both yields the same string, present in
    both deletion sets. So every pair within edit distance 1 shares
    at least one key — candidate generation is exact, no recall loss.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(name_col).alias("name"))
    name = F.col("name")
    dels = F.transform(
        F.sequence(F.lit(1), F.length(name)),
        lambda p: F.concat(
            F.substring(name, F.lit(1), p - F.lit(1)),
            name.substr(p + F.lit(1), F.length(name)),
        ),
    )
    return base.withColumn(
        "key", F.explode(F.array_union(F.array(name), dels))
    )


def _deletion_variants_sql(src_sql: str) -> str:
    """SQL twin: keys = name plus each single-char deletion."""
    return f"""
  SELECT id, name, key FROM (
    SELECT id, name,
           unnest(list_distinct(list_append(
             [substr(name, 1, p - 1) || substr(name, p + 1)
              for p in range(1, length(name) + 1)],
             name))) AS key
    FROM ({src_sql})
  )
"""


def fuzzy_match_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "id",
    left_name: str = "name",
    right_id: str = "id",
    right_name: str = "name",
) -> DataFrame:
    """All (left, right) record pairs within edit distance 1, via
    deletion-neighborhood blocking + one levenshtein verify per
    candidate. Returns (left_id, right_id, left_name, right_name,
    dist)."""
    lk = deletion_variants(left, left_id, left_name).select(
        F.col("id").alias("left_id"), F.col("name").alias("left_name"), "key"
    )
    rk = deletion_variants(right, right_id, right_name).select(
        F.col("id").alias("right_id"), F.col("name").alias("right_name"), "key"
    )
    cand = lk.join(rk, on="key").select(
        "left_id", "right_id", "left_name", "right_name"
    ).distinct()
    return cand.withColumn(
        "dist", F.levenshtein(F.col("left_name"), F.col("right_name"))
    ).filter(F.col("dist") <= 1)


def fuzzy_match_pairs_sql(left_sql: str, right_sql: str) -> str:
    return f"""
WITH lk AS ({_deletion_variants_sql(left_sql)}),
rk AS ({_deletion_variants_sql(right_sql)}),
cand AS (
  SELECT DISTINCT lk.id AS left_id, rk.id AS right_id,
         lk.name AS left_name, rk.name AS right_name
  FROM lk JOIN rk ON rk.key = lk.key
)
SELECT left_id, right_id, left_name, right_name,
       CAST(levenshtein(left_name, right_name) AS INT) AS dist
FROM cand
WHERE levenshtein(left_name, right_name) <= 1
"""


def resolve_entities(pairs: DataFrame) -> DataFrame:
    """Entity resolution over verified match pairs: connected
    components with node ids 'L:<left_id>' / 'R:<right_id>', entity =
    min node id in the component. Returns (node, entity_id,
    entity_size, is_canonical) for every node in a match."""
    edges = pairs.select(
        F.concat(F.lit("L:"), F.col("left_id").cast("string")).alias("doc_a"),
        F.concat(F.lit("R:"), F.col("right_id").cast("string")).alias("doc_b"),
    ).distinct()
    comp = connected_components(edges, numeric_ids=False)
    size = comp.groupBy("cluster_id").agg(F.count("*").alias("entity_size"))
    return comp.join(size, "cluster_id").select(
        F.col("doc_id").alias("node"),
        F.col("cluster_id").alias("entity_id"),
        "entity_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def resolve_entities_sql(pairs_sql: str) -> str:
    """Transitive closure over the match edges (recursive CTE — fine
    at oracle scale; the engine side runs the bounded label
    propagation instead)."""
    return f"""
WITH RECURSIVE mp AS ({pairs_sql}),
sym AS (
  SELECT 'L:' || left_id::VARCHAR AS s, 'R:' || right_id::VARCHAR AS d FROM mp
  UNION
  SELECT 'R:' || right_id::VARCHAR, 'L:' || left_id::VARCHAR FROM mp
),
reach(v, r) AS (
  SELECT s, s FROM sym
  UNION
  SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.v
),
lab AS (
  SELECT v AS node, min(r) AS entity_id FROM reach GROUP BY v
)
SELECT node, entity_id,
       count(*) OVER (PARTITION BY entity_id) AS entity_size,
       node = entity_id AS is_canonical
FROM lab
"""
