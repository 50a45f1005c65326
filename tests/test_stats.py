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
