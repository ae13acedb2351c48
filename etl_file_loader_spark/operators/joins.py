"""Join operators beyond plain equi-joins.

The reference's joins are all grain equi-joins / EXISTS probes (SURVEY §2.5);
these are the analytics-grade extensions a Spark engine needs:

 - as-of join: for each left row, the latest right row with
   right.time <= left.time within the same key. Spark has no native as-of
   join; the scalable re-expression is the UNION + WINDOW trick: tag both
   sides, sort-partition by (key, time, side) once, and carry the last seen
   right row forward with ``last(..., ignorenulls=True)``. One shuffle on the
   key — no range-join row explosion, no per-group pandas. Skew in a hot key
   degrades to that key's partition only (AQE splits oversized partitions).
 - range join (bucketized): equi-join on coarse time buckets + residual
   filter, for "right.time within [left.time - w, left.time]" semantics.
   Bucketing turns an O(n*m) theta-join into a banded equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Latest-right-row-at-or-before-left-time per key.

    Returns ``left`` columns + ``<right_col><suffix>`` columns (null when no
    right row precedes the left row).
    """
    l_struct_type = left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
    r_struct_type = (
        right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_struct_type).alias("_l"),
        F.struct(*right_cols).alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows (side 0) sort before left rows at the same timestamp, so a
    # right row AT the left time is visible to it (<= semantics)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    out_left = carried.filter(F.col("_side") == 1)
    cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"_last_r.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return out_left.select(*cols)


def bucketized_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    window_seconds: int,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """right.time in [left.time - window, left.time], same key.

    Each left row joins its own and the preceding time bucket(s) only —
    the shuffle key is (key, bucket), bounding the candidate set by bucket
    width instead of the full key group.
    """
    bucket_seconds = bucket_seconds or window_seconds
    n_buckets = window_seconds // bucket_seconds + 1
    l_b = left.withColumn(
        "_lb", (F.unix_micros(F.col(left_time)) / (bucket_seconds * 1_000_000)).cast("long")
    )
    r_b = right.withColumn(
        "_rb", (F.unix_micros(F.col(right_time)) / (bucket_seconds * 1_000_000)).cast("long")
    )
    expanded = l_b.withColumn(
        "_probe", F.explode(F.sequence(F.col("_lb") - n_buckets + 1, F.col("_lb")))
    )
    joined = expanded.join(
        r_b, (expanded[on] == r_b[on]) & (expanded._probe == r_b._rb), "inner"
    ).drop(r_b[on])
    lt, rt = F.col(left_time), F.col(right_time)
    return joined.filter(
        (F.unix_micros(rt) >= F.unix_micros(lt) - window_seconds * 1_000_000)
        & (F.unix_micros(rt) <= F.unix_micros(lt))
    ).drop("_lb", "_rb", "_probe")
