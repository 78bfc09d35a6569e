"""Scalable ordered-window primitives.

The reference's sessionizer is a single ordered pass with mutable state
(main.py:69-184). The naive Spark translation is
``Window.orderBy(msg_idx)`` with no partitioning — correct, but a
single-partition sort that cannot scale (SURVEY.md §4, "ordered
sessionization" row).

``prefix_sum`` implements the scalable two-phase pattern instead:

1. bucket rows by range on the order column (narrow, preserves order
   within buckets),
2. aggregate per-bucket partial sums (tiny — one row per bucket),
3. window over the *buckets* to get each bucket's carry-in offset
   (driver-scale data, cheap),
4. broadcast-join the offsets back and add the within-bucket running
   sum computed under ``Window.partitionBy(bucket).orderBy(order)``.

Every stage is shuffle-light and no single task ever sees the whole
stream, so this holds at 100 TB. The DuckDB oracle for consumers uses a
plain global window — same semantics, different physical plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Rows per range bucket. At 100 TB you would size this so a bucket's
#: rows fit one task (~a few million); small here so tests exercise the
#: multi-bucket carry path.
DEFAULT_BUCKET_SIZE = 100_000


def prefix_sum(
    df: DataFrame,
    value: Column,
    order_col: str,
    out_name: str,
    bucket_size: int = DEFAULT_BUCKET_SIZE,
) -> DataFrame:
    """Add ``out_name`` = running sum of ``value`` ordered by
    ``order_col`` (rows unbounded preceding → current), computed with the
    two-phase distributed prefix sum described above.

    ``order_col`` must be unique and monotonically increasing (a Kafka
    offset / message index stand-in, FIXTURES.md B1).
    """
    bucketed = df.withColumn("__v", value).withColumn(
        "__bucket", (F.col(order_col) / F.lit(bucket_size)).cast("long")
    )
    # Per-bucket totals, then exclusive running total over buckets.
    # The bucket table is |data| / bucket_size rows — tiny.
    offsets = (
        bucketed.groupBy("__bucket")
        .agg(F.sum("__v").alias("__bucket_sum"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__bucket_sum").over(
                    Window.orderBy("__bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__bucket", "__offset")
    )
    within = F.sum("__v").over(
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_name, (F.col("__offset") + within))
        .drop("__bucket", "__offset", "__v")
    )
