"""Retry-pyramid audit over a fetch-attempt log.

The live retry ladder runs inside plans/crawl.py (a transient failure
re-enters the frontier with decayed priority and ``attempts``+1 until
``max_attempts``, then quarantines into the errors table — reference:
/root/reference/middlewares/YlSpiderMiddleware.py:80-109,
CtripSpiderMiddleware.py:253-266). These operators are the OFFLINE audit of
the same semantics over any attempt log (url/key, attempt time, outcome):
what the reference's ad-hoc log greps become when the log is a table.

Both are single-window / single-groupBy shapes — no driver state, no UDFs —
so they run unchanged over a 100 TB attempt log partitioned by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retry_audit(
    attempts: DataFrame,
    key_col: str = "key",
    order_cols: tuple[str, ...] = ("ts",),
    failed_col: str = "failed",
    max_attempts: int = 3,
) -> DataFrame:
    """Per-attempt disposition under the bounded-retry rule.

    Input: one row per attempt with a boolean ``failed_col``. Output adds:
      * ``attempt_no`` — 1-based attempt index per key (by ``order_cols``);
      * ``fail_no`` — running failure count per key (the live ladder's
        ``attempts`` column: only failures consume retry budget);
      * ``disposition`` — 'ok' for a success; 'retried' for a failure with
        budget left; 'quarantined' once ``max_attempts`` failures are spent.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    return attempts.withColumn(
        "attempt_no", F.row_number().over(w)
    ).withColumn(
        "fail_no", F.sum(F.col(failed_col).cast("long")).over(wrun)
    ).withColumn(
        "disposition",
        F.when(~F.col(failed_col), F.lit("ok"))
         .when(F.col("fail_no") < F.lit(max_attempts), F.lit("retried"))
         .otherwise(F.lit("quarantined")),
    )


def quarantine_rollup(
    attempts: DataFrame,
    key_col: str = "key",
    order_cols: tuple[str, ...] = ("ts",),
    failed_col: str = "failed",
    max_attempts: int = 3,
) -> DataFrame:
    """Per-key audit: attempts, failures, and whether the key ended up
    quarantined (>= max_attempts failures with no success breaking the
    ladder is approximated by the log-shaped rule: any attempt whose
    disposition is 'quarantined')."""
    audited = retry_audit(attempts, key_col, order_cols, failed_col,
                          max_attempts)
    return audited.groupBy(key_col).agg(
        F.count("*").alias("n_attempts"),
        F.sum(F.col(failed_col).cast("long")).alias("n_failed"),
        F.max((F.col("disposition") == "quarantined").cast("int"))
         .cast("boolean").alias("quarantined"),
    )
