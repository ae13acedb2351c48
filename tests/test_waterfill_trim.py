"""mixture_waterfill + quantile_trim (round 13).

mixture_waterfill's closed-form threshold split must equal the textbook
iterative waterfilling fixpoint on every input (randomized equivalence
below), conserve the budget, and pass zero-weight domains through as
explicit zero rows. quantile_trim's survivors must be exactly the rows
inside the bounds quantile_estimate reports (the suite row
quantile_trim_band carries the cross-engine value oracle; these tests pin
the python-side semantics and the error contract).
"""

import random

import pytest
from pyspark.sql import functions as F

from etl_file_loader_spark.operators.sampling import (
    WATERFILL_MAX_TOKENS,
    mixture_waterfill,
)
from etl_file_loader_spark.operators.sketches import (
    quantile_estimate,
    quantile_histogram,
    quantile_trim,
)


def _py_waterfill(avail: dict, w: dict, budget: int) -> dict:
    """Textbook iterative fixpoint: cap every over-asked domain at its
    supply, redistribute the freed budget among the rest, repeat."""
    active = {d for d in w if w.get(d, 0) > 0 and d in avail}
    alloc = {d: 0 for d in avail}
    rem = budget
    while active:
        tot_w = sum(w[d] for d in active)
        capped = {d for d in active if avail[d] * tot_w <= w[d] * max(rem, 0)}
        if not capped:
            for d in active:
                alloc[d] = (w[d] * max(rem, 0)) // tot_w
            break
        for d in capped:
            alloc[d] = avail[d]
            rem -= avail[d]
        active -= capped
    return alloc


def _run(spark, avail: dict, w: dict, budget: int):
    df = spark.createDataFrame(list(avail.items()), "dom string, toks long")
    return {
        r["dom"]: r
        for r in mixture_waterfill(df, "dom", "toks", w, budget).collect()
    }


def test_waterfill_equals_iterative_fixpoint(spark):
    rng = random.Random(13)
    for trial in range(8):
        n = rng.randint(1, 9)
        doms = [f"d{i}" for i in range(n)]
        avail = {d: rng.randint(0, 5000) for d in doms}
        w = {d: rng.randint(0, 250) for d in doms}
        s = sum(w.values())
        if s == 0:
            w[doms[0]] = 100
        elif s > 1000:
            w = {d: v * 1000 // s for d, v in w.items()}
            if sum(w.values()) == 0:
                w[doms[0]] = 1
        budget = rng.choice([0, rng.randint(1, 12000), sum(avail.values()) * 2])
        got = _run(spark, avail, w, budget)
        exp = _py_waterfill(avail, w, budget)
        for d in doms:
            assert got[d]["alloc"] == exp[d], (trial, d, avail, w, budget)
        # conservation: never over-allocate; spend the budget up to the
        # documented <= |domains| floor-division residue
        total = sum(r["alloc"] for r in got.values())
        ceiling = min(budget, sum(avail.values()))
        covered = min(budget, sum(avail[d] for d in doms if w.get(d, 0) > 0))
        assert total <= ceiling
        assert total >= covered - n


def test_waterfill_capped_and_zero_weight_rows(spark):
    avail = {"big": 10_000, "small": 100, "unweighted": 500}
    got = _run(spark, avail, {"big": 200, "small": 800}, 5_000)
    # small's fair share (4000) dwarfs its supply: capped at 100; big gets
    # the whole remaining budget (its fair share after redistribution)
    assert got["small"]["capped"] == 1 and got["small"]["alloc"] == 100
    assert got["big"]["capped"] == 0 and got["big"]["alloc"] == 4_900
    # zero-weight domain stays in the output as an explicit zero row
    assert got["unweighted"]["alloc"] == 0
    assert got["unweighted"]["capped"] == 0
    assert got["unweighted"]["rate"] == 0.0
    assert got["big"]["rate"] == 0.49


def test_waterfill_budget_exceeds_supply(spark):
    avail = {"a": 100, "b": 300}
    got = _run(spark, avail, {"a": 500, "b": 500}, 10_000)
    assert got["a"]["alloc"] == 100 and got["a"]["capped"] == 1
    assert got["b"]["alloc"] == 300 and got["b"]["capped"] == 1


def test_waterfill_validates_inputs(spark):
    df = spark.createDataFrame([("a", 10)], "dom string, toks long")
    with pytest.raises(ValueError, match="sum"):
        mixture_waterfill(df, "dom", "toks", {"a": 1001}, 100)
    with pytest.raises(ValueError, match="sum"):
        mixture_waterfill(df, "dom", "toks", {"a": 0}, 100)
    with pytest.raises(ValueError, match=">= 0"):
        mixture_waterfill(df, "dom", "toks", {"a": -1, "b": 500}, 100)
    with pytest.raises(ValueError, match="budget"):
        mixture_waterfill(df, "dom", "toks", {"a": 500}, -1)
    with pytest.raises(ValueError, match="budget"):
        mixture_waterfill(df, "dom", "toks", {"a": 500}, WATERFILL_MAX_TOKENS + 1)


def test_waterfill_dataframe_weights_match_dict(spark):
    """Table-resident weights (the large-domain-set path) must produce
    the identical allocation, and fail the same validations."""
    avail = {"a": 500, "b": 2_000, "c": 700}
    w = {"a": 600, "b": 300}
    df = spark.createDataFrame(list(avail.items()), "dom string, toks long")
    wdf = spark.createDataFrame(list(w.items()), "dom string, w_milli long")
    via_dict = {
        r["dom"]: tuple(r)[1:]
        for r in mixture_waterfill(df, "dom", "toks", w, 3_000).collect()
    }
    via_df = {
        r["dom"]: tuple(r)[1:]
        for r in mixture_waterfill(df, "dom", "toks", wdf, 3_000).collect()
    }
    assert via_dict == via_df
    bad = spark.createDataFrame([("a", 1200)], "dom string, w_milli long")
    with pytest.raises(ValueError, match="sum"):
        mixture_waterfill(df, "dom", "toks", bad, 100)
    neg = spark.createDataFrame([("a", -5), ("b", 500)], "dom string, w_milli long")
    with pytest.raises(ValueError, match=">= 0"):
        mixture_waterfill(df, "dom", "toks", neg, 100)
    # ADVICE r13: duplicate domain rows passed the sum check, then the
    # join fanned out the totals row — now rejected up front
    dup = spark.createDataFrame(
        [("a", 300), ("a", 300), ("b", 300)], "dom string, w_milli long"
    )
    with pytest.raises(ValueError, match="duplicate domain"):
        mixture_waterfill(df, "dom", "toks", dup, 100)


def test_waterfill_overflowing_avail_raises(spark):
    """ADVICE r13: a domain whose token supply exceeds the 9e15 ceiling
    silently overflowed the avail*(W-W_prev) cross-multiply. It now
    raises from the allocation pass, naming the domain."""
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [("big", WATERFILL_MAX_TOKENS), ("big", 1), ("ok", 10)],
        "dom string, toks long",
    )
    with pytest.raises(SparkRuntimeException, match="WATERFILL_MAX_TOKENS"):
        mixture_waterfill(df, "dom", "toks", {"big": 500, "ok": 500}, 100).collect()
    # at the ceiling exactly: no raise (the documented supported regime)
    ok = spark.createDataFrame(
        [("big", WATERFILL_MAX_TOKENS), ("ok", 10)], "dom string, toks long"
    )
    assert (
        mixture_waterfill(ok, "dom", "toks", {"big": 500, "ok": 500}, 100).count()
        == 2
    )


def test_waterfill_exact_at_the_ceiling(spark):
    """int64 exactness at the documented magnitude ceiling: one domain
    holding 9e15 tokens against milli weights must not overflow any
    cross-multiply (ceiling * 1000 = 9e18 < int64 max)."""
    avail = {"huge": WATERFILL_MAX_TOKENS, "tiny": 1_000}
    budget = WATERFILL_MAX_TOKENS
    got = _run(spark, avail, {"huge": 999, "tiny": 1}, budget)
    exp = _py_waterfill(avail, {"huge": 999, "tiny": 1}, budget)
    assert {d: r["alloc"] for d, r in got.items()} == exp


def _trim_fixture(spark):
    rows = [("a", float(v)) for v in range(1, 101)] + [
        ("b", float(v * 10)) for v in range(1, 51)
    ]
    rows += [("a", None), ("b", float("nan"))]
    return spark.createDataFrame(rows, "grp string, val double")


def test_quantile_trim_matches_estimated_bounds(spark):
    df = _trim_fixture(spark)
    hist = quantile_histogram(df, ["grp"], "val")
    est = quantile_estimate(hist, ["grp"], [100, 900])
    bounds = {
        (r["grp"], r["q_milli"]): r["est"] for r in est.collect()
    }
    out = quantile_trim(df, ["grp"], "val", 100, 900).collect()
    assert out, "band trim kept nothing"
    for r in out:
        assert bounds[(r["grp"], 100)] <= r["val"] <= bounds[(r["grp"], 900)]
    # survivors = exactly the in-band rows (null/NaN dropped)
    expected = {
        (r["grp"], r["val"])
        for r in df.collect()
        if r["val"] is not None
        and r["val"] == r["val"]  # not NaN
        and bounds[(r["grp"], 100)] <= r["val"] <= bounds[(r["grp"], 900)]
    }
    assert {(r["grp"], r["val"]) for r in out} == expected


def test_quantile_trim_one_sided_and_bounds_columns(spark):
    df = _trim_fixture(spark)
    hi_only = quantile_trim(df, ["grp"], "val", hi_milli=500, keep_bounds=True)
    assert "_q_hi" in hi_only.columns and "_q_lo" not in hi_only.columns
    a_vals = [r["val"] for r in hi_only.filter(F.col("grp") == "a").collect()]
    # p50 of 1..100 estimates near 50: the top half is gone
    assert max(a_vals) <= 51 and len(a_vals) >= 45
    lo_only = quantile_trim(df, ["grp"], "val", lo_milli=500)
    assert "_q_lo" not in lo_only.columns
    assert min(r["val"] for r in lo_only.filter(F.col("grp") == "a").collect()) >= 49


def test_quantile_trim_validates_inputs(spark):
    df = _trim_fixture(spark)
    with pytest.raises(ValueError, match="at least one"):
        quantile_trim(df, ["grp"], "val")
    with pytest.raises(ValueError, match="lo_milli > hi_milli"):
        quantile_trim(df, ["grp"], "val", 900, 100)
