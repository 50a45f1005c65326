"""stats.ks_statistic: known-value and invariance checks."""


def test_ks_identical_distributions_is_zero(spark):
    from sgp_sketch.stats import ks_statistic

    rows = [(g, float(v)) for g in ("a", "b") for v in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_statistic(df, "v", "g", "a", "b").collect()[0]
    assert r.ks == 0.0 and r.n_a == 10 and r.n_b == 10


def test_ks_disjoint_distributions_is_one(spark):
    from sgp_sketch.stats import ks_statistic

    rows = ([("a", float(v)) for v in range(5)]
            + [("b", float(v + 100)) for v in range(5)])
    df = spark.createDataFrame(rows, "g string, v double")
    assert ks_statistic(df, "v", "g", "a", "b").collect()[0].ks == 1.0


def test_ks_known_small_case(spark):
    # a = {1,2}, b = {2,3}: F_a-F_b is .5 at v=1, .5 at v=2, 0 at v=3
    from sgp_sketch.stats import ks_statistic

    rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0),
            ("c", 9.0), ("a", None)]  # other group + NULL are ignored
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_statistic(df, "v", "g", "a", "b").collect()[0]
    assert abs(r.ks - 0.5) < 1e-12 and r.n_a == 2 and r.n_b == 2


def test_ks_binned_bounds_exact(spark):
    """Binned KS stays within one bin of mass of the exact statistic,
    and shrinks the window's input to the bin count."""
    from sgp_sketch.stats import ks_statistic

    rows = ([("a", v / 10.0) for v in range(100)]
            + [("b", v / 10.0 + 2.0) for v in range(100)])
    df = spark.createDataFrame(rows, "g string, v double")
    exact = ks_statistic(df, "v", "g", "a", "b").collect()[0].ks
    binned = ks_statistic(df, "v", "g", "a", "b",
                          bin_width=1.0).collect()[0].ks
    assert abs(binned - exact) <= 0.1 + 1e-12  # <= one bin of mass
    assert binned > 0.15  # still detects the shift

def test_zipf_slope_exact_power_law(spark):
    """Tokens drawn with exact count = 64 >> 1: count_r = 2^(7-r) for
    rank r in 1..4 gives slope = ln(c)/ln(r) regression we can compute
    with numpy and must match to 6 decimals."""
    import numpy as np

    from sgp_sketch.stats import zipf_slope

    words = {"aa": 64, "bb": 32, "cc": 16, "dd": 8}
    text = " ".join(w for w, c in sorted(words.items()) for _ in range(c))
    df = spark.createDataFrame([(text,)], "text string")
    r = zipf_slope(df).collect()[0]
    x = np.log(np.arange(1, 5)); y = np.log([64.0, 32, 16, 8])
    want = np.polyfit(x, y, 1)[0]
    assert r.n_types == 4 and r.n_tokens == 120
    assert abs(r.slope - round(float(want), 6)) <= 1e-6


def test_zipf_slope_rank_ties_break_on_token(spark):
    from sgp_sketch.stats import zipf_slope

    # all counts equal: slope of constant y is 0; ties must not crash
    df = spark.createDataFrame([("x y z",)], "text string")
    r = zipf_slope(df).collect()[0]
    assert r.slope == 0.0 and r.n_types == 3 and r.n_tokens == 3


def test_mad_outliers_known_values(spark):
    from sgp_sketch.stats import mad_outliers

    # group g: values 1..9 plus one wild 1000
    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "t string, v double")
    r = mad_outliers(df, "v", "t", k=3.0).collect()[0]
    # median of 10 sorted values = (5+6)/2 = 5.5; devs of 1..9 are
    # 4.5,3.5,...,3.5 and 994.5 -> sorted devs .5,.5,1.5,1.5,2.5,2.5,
    # 3.5,3.5,4.5,994.5, mad = 2.5; only 1000 exceeds 5.5+3*2.5
    assert r.med == 5.5 and r.mad == 2.5
    assert r.n_outliers == 1 and r.n == 10


def test_mad_outliers_null_safe_and_grouped(spark):
    from sgp_sketch.stats import mad_outliers

    rows = [("a", 1.0), ("a", 1.0), ("a", None), ("b", 7.0)]
    df = spark.createDataFrame(rows, "t string, v double")
    out = {r.t: r for r in mad_outliers(df, "v", "t").collect()}
    assert out["a"].n == 2 and out["a"].mad == 0.0
    assert out["b"].med == 7.0 and out["b"].n_outliers == 0


def test_equi_width_histogram_edges_and_clamp(spark):
    from sgp_sketch.stats import equi_width_histogram

    rows = [(-5.0,), (0.0,), (49.999,), (50.0,), (499.0,), (777.0,),
            (None,)]
    df = spark.createDataFrame(rows, "value double")
    out = {r.bucket: r for r in
           equi_width_histogram(df, "value", 0.0, 500.0, 10).collect()}
    assert out[0].n == 3            # -5 clamps down, 0 and 49.999 in
    assert out[1].n == 1            # 50.0 is the half-open right edge
    assert out[9].n == 2            # 499 in range, 777 clamps up
    assert out[0].lo_edge == 0.0 and out[9].lo_edge == 450.0
    assert sum(r.n for r in out.values()) == 6  # NULL dropped


def test_zscore_day_anomalies_flags_spike(spark):
    from sgp_sketch.stats import zscore_day_anomalies

    rows = ([(f"2024-01-{d:02d} 00:00:0{i}",) for d in range(1, 8)
             for i in range(3)]            # 7 quiet days, 3 events each
            + [("2024-01-08 00:00:00",)] * 30)  # one spike day
    df = spark.createDataFrame(rows, "s string").selectExpr(
        "CAST(s AS TIMESTAMP) AS ts")
    out = {str(r.day): r for r in zscore_day_anomalies(df, "ts").collect()}
    assert len(out) == 8
    assert out["2024-01-08"].is_anomaly == 1
    assert all(v.is_anomaly == 0 for k, v in out.items()
               if k != "2024-01-08")
    assert out["2024-01-08"].z > 2.0

def test_psi_identical_distributions_is_zero(spark):
    from sgp_sketch.stats import psi_drift

    rows = [(g, float(v % 100)) for g in ("a", "b") for v in range(200)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = psi_drift(df, "v", "g", "a", "b", lo=0.0, hi=100.0,
                  nbins=5).collect()[0]
    assert r.psi == 0.0 and r.n_a == 200 and r.n_b == 200


def test_psi_known_two_bin_case(spark):
    import math

    from sgp_sketch.stats import psi_drift

    # a: 80/20 across the two bins, b: 20/80
    rows = ([("a", 1.0)] * 80 + [("a", 9.0)] * 20
            + [("b", 1.0)] * 20 + [("b", 9.0)] * 80)
    df = spark.createDataFrame(rows, "g string, v double")
    r = psi_drift(df, "v", "g", "a", "b", lo=0.0, hi=10.0,
                  nbins=2).collect()[0]
    want = 2 * (0.8 - 0.2) * math.log(0.8 / 0.2)
    assert abs(r.psi - round(want, 6)) <= 1e-6


def test_psi_empty_bin_smoothing_finite(spark):
    from sgp_sketch.stats import psi_drift

    # group b never hits the upper bin: eps floor keeps psi finite
    rows = [("a", 1.0)] * 5 + [("a", 9.0)] * 5 + [("b", 1.0)] * 10
    df = spark.createDataFrame(rows, "g string, v double")
    r = psi_drift(df, "v", "g", "a", "b", lo=0.0, hi=10.0,
                  nbins=2).collect()[0]
    import math
    assert math.isfinite(r.psi) and r.psi > 0


def test_zscore_constant_series_flags_nothing(spark):
    """A perfectly steady ingest (stddev 0) must read 'no anomaly' — the
    unguarded 0/0 z is NaN, which Spark orders above every threshold."""
    from sgp_sketch.stats import zscore_day_anomalies

    df = spark.createDataFrame(
        [(f"2024-01-0{d} 00:00:0{i}",) for d in range(1, 6)
         for i in range(3)],
        "ts string").selectExpr("cast(ts as timestamp) ts")
    out = zscore_day_anomalies(df).collect()
    assert len(out) == 5
    assert all(r["z"] == 0.0 and r["is_anomaly"] == 0 for r in out)
    # single-day input: stddev_samp is NULL — same contract
    one = zscore_day_anomalies(
        df.limit(3)).collect()
    assert len(one) == 1 and one[0]["is_anomaly"] == 0


def test_psi_empty_group_is_finite_and_loud(spark):
    """PSI vs a missing/misspelled group must come back finite (the eps
    floor), never NaN (NaN > any_gate is TRUE in Spark)."""
    import math

    from sgp_sketch.stats import psi_drift

    df = spark.createDataFrame(
        [(float(i % 10), "a") for i in range(100)],
        "v double, g string")
    row = psi_drift(df, "v", "g", "a", "NOPE", lo=0.0, hi=10.0).first()
    assert row["n_b"] == 0
    assert row["psi"] is not None and math.isfinite(row["psi"])
    assert row["psi"] > 0.25  # loud: reads as maximal drift


def test_histogram_excludes_nan(spark):
    from sgp_sketch.stats import equi_width_histogram

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (float("nan"),), (None,)], "v double")
    out = equi_width_histogram(df, "v", lo=0.0, hi=4.0, nbins=4).collect()
    assert sum(r["n"] for r in out) == 2
    assert all(r["avg_value"] == r["avg_value"] for r in out)  # no NaN


def test_moments_drift_exact_and_degenerate(spark):
    """moments_drift: (a) matches a direct exact computation, (b) missing
    group and zero-variance group yield NULL gates + loud n columns, not
    crashes."""
    import math

    import pandas as pd
    import pytest

    from sgp_sketch.stats import moments_drift

    pdf = pd.DataFrame({
        "g": ["a"] * 6 + ["b"] * 4 + ["c"] * 3,
        "v": [1, 2, 3, 4, 5, 6, 10, 20, 30, 40, 7, 7, 7],
    })
    sdf = spark.createDataFrame(pdf, "g string, v long")
    row = moments_drift(sdf, "v", "g", "a", "b").collect()[0]
    xa = [1, 2, 3, 4, 5, 6]
    xb = [10, 20, 30, 40]
    ma, mb = sum(xa) / 6.0, sum(xb) / 4.0
    va = sum(x * x for x in xa) / 6.0 - ma * ma
    vb = sum(x * x for x in xb) / 4.0 - mb * mb
    assert row["n_a"] == 6 and row["n_b"] == 4
    assert row["var_ratio"] == pytest.approx(va / vb, rel=1e-12)
    assert row["std_mean_diff"] == pytest.approx(
        (ma - mb) / math.sqrt((va + vb) / 2.0), rel=1e-12)
    # zero-variance comparison group: ratio/smd NULL, counts loud
    row = moments_drift(sdf, "v", "g", "a", "c").collect()[0]
    assert row["n_b"] == 3 and row["var_ratio"] is None
    assert row["std_mean_diff"] is None and row["skew_delta"] is None
    # missing group entirely
    row = moments_drift(sdf, "v", "g", "a", "nope").collect()[0]
    assert row["n_b"] == 0 and row["var_ratio"] is None
