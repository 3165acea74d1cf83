"""Parallel deterministic global ranking.

``row_number().over(Window.orderBy(...))`` funnels every row through ONE
task — fine for a 4k-row wave, an Amdahl wall for a 10^7-row wave. This
operator assigns the identical total order in parallel:

  1. ``repartitionByRange`` on the order key (range sampling splits the key
     space across P partitions);
  2. per-partition counts → running-sum offsets (a P-row aggregate, not
     rows), broadcast-joined back — NO driver collect: the offsets are a
     subquery of the SAME plan, so the whole rank is one job and the
     range exchange is computed once and reused (ReusedExchange), instead
     of a separate counts action that re-materialized the upstream chain
     every scheduling round;
  3. parallel ``row_number`` windows partitioned by partition id, plus the
     partition's offset.

The resulting rank depends only on the sort key (keys must be unique —
ours end in url_hash), NOT on where range boundaries land, so the crawl
order stays byte-identical at any parallelism (O3 invariant, SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols: list[Column],
                rank_col: str = "rank",
                small_threshold: int | None = None) -> DataFrame:
    """Attach a 1-based dense total-order rank over ``order_cols``.

    ``small_threshold``: if given and df has fewer rows, fall back to the
    single-partition window (cheaper below ~100k rows)."""
    if small_threshold is not None and df.count() <= small_threshold:
        return df.withColumn(
            rank_col, F.row_number().over(Window.orderBy(*order_cols)))

    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n_part, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # running-sum offsets over the P-row per-partition counts; the window
    # orders a tiny aggregate (one row per range partition), so its single
    # task is O(P), never O(rows)
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy("__pid").agg(F.count("*").alias("__n"))
        .withColumn("__offset",
                    F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
        .select("__pid", "__offset")
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col,
                    (F.row_number().over(w) + F.col("__offset")).cast("int"))
        .drop("__pid", "__offset")
    )
