"""Table profiler: one-pass-per-shape per-column statistics.

The data-quality surface every warehouse loader grows eventually (the
reference's audit layer checks grain uniqueness and custom SQL contracts
— audit.py — but has no generic column profiler; this is the natural
extension): for every column, null/distinct counts, typed min/max, and
the modal value, as ONE DataFrame with a row per column.

Plan shape (100 TB):

- pass 1 is a single scalar aggregate (map-side partials, one 1-row
  exchange): total rows + per-column non-null counts and typed min/max.
- pass 2 is the unpivot path: ``stack`` each row into (col, value)
  pairs — scan-shaped, no Python — then ONE hash aggregation per
  (col, value), then two tiny follow-up aggs per column (distinct
  count; max count + min value at the max = deterministic mode with
  count-desc/value-asc tie-break). Every agg has map-side partial
  aggregation; there is NO window over a whole column's values, so a
  unique-key column (n_distinct = n_rows) never lands in one task.

Cross-engine discipline: all comparisons/casts are exact. Double
columns keep min/max as doubles (stored values, zero arithmetic) and
SKIP the string mode/min/max (Java and DuckDB shortest-repr float
formatting are not bit-identical in edge cases); everything else
stringifies via the typed cast both engines render identically
(ints, decimals, dates, timestamps, strings). Distinct counts use the
per-engine string cast, which is injective per engine, so counts match
even where reprs would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# dtypes whose string rendering is NOT guaranteed identical across
# engines (shortest-round-trip float formatting differs in edge cases)
_FLOATY = ("double", "float")


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Returns one row per column: ``col_name, dtype, n_rows, n_nulls,
    n_distinct, min_str, max_str, min_num, max_num, top_val,
    top_count``. ``min_num``/``max_num`` are populated for float
    columns (``min_str``/``max_str``/``top_val`` NULL there);
    all-null columns report ``n_distinct = 0`` and NULL extrema.
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)

    # ---- pass 1: one scalar aggregate over the scan ----
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        if dtypes[c] in _FLOATY:
            aggs.append(F.min(c).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"_max_{c}"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"_min_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"_max_{c}"))
    base = df.agg(*aggs)

    # explode the 1-row aggregate into the per-column spine (keeps the
    # whole profile a single logical plan — no driver-side collect)
    spine_structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.lit(dtypes[c]).alias("dtype"),
            F.col("_n_rows").alias("n_rows"),
            (F.col("_n_rows") - F.col(f"_nn_{c}")).alias("n_nulls"),
            (
                F.lit(None).cast("string")
                if dtypes[c] in _FLOATY
                else F.col(f"_min_{c}")
            ).alias("min_str"),
            (
                F.lit(None).cast("string")
                if dtypes[c] in _FLOATY
                else F.col(f"_max_{c}")
            ).alias("max_str"),
            (
                F.col(f"_min_{c}")
                if dtypes[c] in _FLOATY
                else F.lit(None).cast("double")
            ).alias("min_num"),
            (
                F.col(f"_max_{c}")
                if dtypes[c] in _FLOATY
                else F.lit(None).cast("double")
            ).alias("max_num"),
        )
        for c in cols
    ]
    spine = base.select(
        F.explode(F.array(*spine_structs)).alias("s")
    ).select("s.*")

    # ---- pass 2: unpivot -> (col, val) counts -> per-column rollups ----
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*").filter(F.col("val").isNotNull())
    vcounts = pairs.groupBy("col_name", "val").agg(F.count(F.lit(1)).alias("cnt"))
    ndistinct = vcounts.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    topcnt = vcounts.groupBy("col_name").agg(F.max("cnt").alias("top_count"))
    mode = (
        vcounts.join(topcnt, "col_name")
        .filter(F.col("cnt") == F.col("top_count"))
        .groupBy("col_name")
        .agg(F.min("val").alias("top_val"), F.max("cnt").alias("top_count"))
    )

    floaty = [c for c in cols if dtypes[c] in _FLOATY]
    out = (
        spine.join(ndistinct, "col_name", "left")
        .join(mode, "col_name", "left")
        .select(
            "col_name",
            "dtype",
            "n_rows",
            "n_nulls",
            F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
            "min_str",
            "max_str",
            "min_num",
            "max_num",
            # float reprs are engine-local: keep their counts, drop the strings
            F.when(F.col("col_name").isin(floaty) if floaty else F.lit(False), None)
            .otherwise(F.col("top_val"))
            .alias("top_val"),
            "top_count",
        )
    )
    return out
