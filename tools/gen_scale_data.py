"""Scale up a testdata sf directory by integer replication with key offsets.

Usage: python tools/gen_scale_data.py SRC_DIR DST_DIR FACTOR

Produces FACTOR logical copies of every scaling table, each copy's keys
offset by copy_index * (max_key + 1) so referential structure (customer ->
orders -> lineitem, part/supplier -> lineitem) is preserved within each
copy and keys never collide across copies. Dimension tables (region,
nation) are copied 1:1 — exactly how TPC-H itself scales.

Content perturbation keeps duplicate structure realistic instead of
degenerate (every row having FACTOR-1 exact clones):
  - documents: copies > 0 append a short copy marker to 80% of texts
    (n_chars recomputed), leaving 20% exact cross-copy duplicates — a
    realistic duplication rate for a web corpus.
  - embeddings: copies > 0 add deterministic hash-derived noise and
    renormalize, so copies are near-duplicates (cos ~ 0.999) rather than
    bit-equal — the shape ANN/near-dup operators see in practice.
    Embeddings scale by min(FACTOR, 4): the driver's own sf ratio
    (500 @ sf0.01 -> 2000 @ sf0.1) and the O(candidate-pairs) demos both
    follow that curve.

The replication itself runs as a Spark plan (union of offset projections),
so the same tool scales to generating arbitrarily large inputs on a
cluster.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_file_loader_spark.session import get_spark  # noqa: E402

FIXED = ["region", "nation"]
# table -> (primary offset key, [foreign keys offset by the referenced
# table's stride])
SCALING: dict[str, tuple[str, dict[str, str]]] = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": ("l_orderkey", {"l_partkey": "part", "l_suppkey": "supplier"}),
    "events": ("event_id", {"user_id": "user_id"}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = get_spark("gen-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    Path(dst).mkdir(parents=True, exist_ok=True)

    strides: dict[str, int] = {}
    for t, (pk, _) in SCALING.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        strides[t] = int(df.agg(F.max(pk)).collect()[0][0]) + 1
    # events.user_id has its own key space
    strides["user_id"] = (
        int(
            spark.read.parquet(f"{src}/events.parquet")
            .agg(F.max("user_id"))
            .collect()[0][0]
        )
        + 1
    )

    for t in FIXED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: copied 1:1")

    for t, (pk, fks) in SCALING.items():
        k = min(factor, 4) if t == "embeddings" else factor
        df = spark.read.parquet(f"{src}/{t}.parquet")
        copies = []
        for i in range(k):
            c = df
            c = c.withColumn(pk, F.col(pk) + F.lit(i * strides[t]))
            for fk, ref in fks.items():
                c = c.withColumn(fk, F.col(fk) + F.lit(i * strides[ref]))
            if i > 0 and t == "documents":
                marked = F.concat(F.col("text"), F.lit(f" c{i}"))
                c = c.withColumn(
                    "text",
                    F.when(F.col("doc_id") % 5 != 0, marked).otherwise(F.col("text")),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if i > 0 and t == "embeddings":
                # deterministic per-(vector, dim, copy) noise, then renorm
                noise = lambda x, j: x + (  # noqa: E731
                    (F.hash(F.col("vec_id"), j, F.lit(i)) % 2001 - 1000) / 1000.0
                ) * 0.05
                c = c.withColumn(
                    "embedding", F.transform("embedding", noise)
                ).withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x: (
                            x
                            / F.sqrt(
                                F.aggregate(
                                    F.col("embedding"),
                                    F.lit(0.0),
                                    lambda a, y: a + y * y,
                                )
                            )
                        ).cast("float"),
                    ),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: x{k} -> {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
