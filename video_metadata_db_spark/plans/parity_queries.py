"""Parity queries: the reference's own query surface, oracle-paired.

The variant report is the flagship (the reference's only true query,
``video_metadata_db.py:1106-1213``); merge and update modes are the
other two entry points (``:1361-1456``, ``:427-452``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.parity import (
    SYNTHETIC_FILENAME_SQL,
    synthetic_part_filenames,
    update_new_files,
    variant_report_flat,
)
from ..sources.tables import load_table
from .registry import query

# DuckDB-side reimplementation of the title/year parse for the synthetic
# convention (always "[yyyy] Title [idents]"), matching
# functions/scalar.py:parse_title / parse_release_year on these inputs.
_PARSE_CTE = f"""
WITH named AS (
  SELECT *, {SYNTHETIC_FILENAME_SQL} AS name FROM part
), stemmed AS (
  SELECT *, regexp_replace(name, '\\.[^.]*$', '') AS stem FROM named
), cleaned AS (
  SELECT *,
    replace(replace(replace(stem, '[4K]', ''), '[AV1]', ''), '[3D]', '') AS t
  FROM stemmed
), parsed AS (
  SELECT *,
    trim(CASE WHEN strpos(t, '[') > 0 AND strpos(t, '[') < length(t)
         THEN CASE WHEN strpos(t, ']') > 0 THEN substr(t, strpos(t, ']') + 1) ELSE '' END
         ELSE t END) AS title,
    split_part(CASE WHEN strpos(t, '[') > 0 THEN substr(t, strpos(t, '[') + 1) ELSE '' END,
               ']', 1) AS release_year
  FROM cleaned
)
"""


@query(
    "variant_report",
    oracle=_PARSE_CTE
    + """
SELECT title,
       count(*) AS n_variants,
       count(DISTINCT release_year) AS n_years,
       min(TRY_CAST(release_year AS INTEGER)) AS min_year,
       max(TRY_CAST(release_year AS INTEGER)) AS max_year
FROM parsed
GROUP BY title
HAVING count(*) > 1
ORDER BY n_variants DESC, title
""",
)
def q_variant_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: duplicate-title detection over synthesized filenames."""
    part = load_table(spark, sf_dir, "part")
    return variant_report_flat(synthetic_part_filenames(part), "name")


@query(
    "update_anti_join",
    oracle="""
SELECT p.p_partkey, p.p_name
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM part e WHERE e.p_partkey % 10 < 4 AND e.p_partkey = p.p_partkey
  )
ORDER BY p.p_partkey
""",
)
def q_update_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update mode's membership check (:427-452) as a left-anti join.

    "Existing db" = the 40% of parts already probed (key % 10 < 4);
    candidates = the full listing; the anti-join returns only the
    genuinely new entries to probe — non-empty at every scale factor.
    """
    part = load_table(spark, sf_dir, "part")
    existing = part.filter(F.col("p_partkey") % 10 < 4)
    return (
        update_new_files(part, existing, key="p_partkey")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@query(
    "merge_union_sort",
    oracle="""
SELECT * FROM (
  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderkey % 2 = 1
)
ORDER BY o_totalprice DESC, o_orderkey
""",
)
def q_merge_union_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge mode (:1361-1456): union-all two "databases" + global sort."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    db_a = orders.filter(F.col("o_orderkey") % 2 == 0)
    db_b = orders.filter(F.col("o_orderkey") % 2 == 1)
    from ..operators.parity import merge_metadata_dbs

    return merge_metadata_dbs(
        [db_a, db_b], [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    )
