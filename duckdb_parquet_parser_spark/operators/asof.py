"""As-of join — a reference-absent operator (SURVEY.md §2.4) implemented
Spark-first as the union + last-value-carry-forward pattern.

Why not a naive inequality join: ``l JOIN r ON key AND l.ts >= r.ts`` then
max — that explodes to O(|matches|) rows before aggregating. The union
trick is one shuffle on the key, linear state, and maps directly onto
sort-merge execution — the same plan a native as-of join (DuckDB ASOF
JOIN, pandas merge_asof) uses, so it survives 100 TB with skew handled by
AQE. Tie semantics: right rows sort before left rows at equal ts, so
``l.ts >= r.ts`` matches (backward as-of, DuckDB default).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts <= left_ts`` within the same ``on`` key.

    Returns the left columns plus ``asof_<payload>`` columns. ``how`` is
    ``inner`` (drop unmatched, DuckDB ASOF JOIN default) or ``left``.
    """
    lcols = left.columns
    l = left.withColumn("_ts", F.col(left_ts).cast("timestamp")).withColumn(
        "_side", F.lit(1)
    )
    # The whole right payload rides in ONE struct, so the carried value is
    # exactly the latest matched right row — even if some payload fields of
    # that row are NULL (last(ignorenulls) per-field would smear older rows).
    r = right.select(
        F.col(on),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(p).alias(p) for p in right_payload]).alias("_r"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    if how == "inner":
        out = out.filter(F.col("_last_r").isNotNull())
    return out.select(
        *lcols,
        *[F.col(f"_last_r.{p}").alias(f"asof_{p}") for p in right_payload],
    )
