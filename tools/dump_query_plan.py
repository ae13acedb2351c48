"""Dump `.explain("formatted")` for named suite queries to plan files.

Usage: python tools/dump_query_plan.py <suffix> q1 q2 ...

Writes plans/r15/<query>_<suffix>.txt for each named query (suffix is
"before" or "after" by round convention). The plan is the pre-execution
formatted physical plan — the same artifact the round docs cite for
Exchange counts, join strategies, PushedFilters and Python-eval nodes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_file_loader_spark import suite  # noqa: E402
from etl_file_loader_spark.operators.cache import release_operator_caches  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-query-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = suite.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue().splitlines())} lines)")
        release_operator_caches()


if __name__ == "__main__":
    main()
