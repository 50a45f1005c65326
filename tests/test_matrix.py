"""matrix.fd_agg / principal_spectrum: distributed Frequent Directions
must obey the same spectral bounds as the in-process kernel, across
partitionings, and the query surface must report certified values."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def lowrank_df(spark):
    rng = np.random.default_rng(17)
    n, d = 2000, 24
    A = (rng.normal(size=(n, 2)) @ rng.normal(size=(2, d)) * 4
         + rng.normal(size=(n, d)) * 0.05)
    grp = np.where(np.arange(n) % 2 == 0, "a", "b")
    rows = [(g, v.tolist()) for g, v in zip(grp.tolist(), A)]
    df = spark.createDataFrame(rows, "g string, vec array<double>")
    return df.repartition(7), A, grp


def test_fd_agg_global_bound(spark, lowrank_df):
    from sgp_sketch.kernels import registry
    from sgp_sketch.matrix import fd_agg

    df, A, _ = lowrank_df
    blobs = fd_agg(df, "vec", d=24, ell=10).toPandas()
    assert len(blobs) == 1
    st = registry.from_bytes(bytes(blobs["state"].iloc[0]))
    assert st.n_rows == A.shape[0]
    G = A.T @ A
    assert np.linalg.norm(G - st.gram(), 2) <= st.shed + 1e-6
    assert st.shed <= float((A ** 2).sum()) / 10 + 1e-6
    assert st.rows.shape[0] <= 10  # blob was shrunk before shuffle


def test_fd_agg_grouped_and_partition_invariant_bounds(spark, lowrank_df):
    from sgp_sketch.kernels import registry
    from sgp_sketch.matrix import fd_agg

    df, A, grp = lowrank_df
    for nparts in (3, 13):
        blobs = fd_agg(df.repartition(nparts), "vec", d=24, ell=10,
                       group_cols=("g",)).toPandas()
        assert sorted(blobs["g"]) == ["a", "b"]
        for g in "ab":
            Ag = A[grp == g]
            st = registry.from_bytes(
                bytes(blobs.loc[blobs.g == g, "state"].iloc[0]))
            assert st.n_rows == Ag.shape[0]
            err = np.linalg.norm(Ag.T @ Ag - st.gram(), 2)
            assert err <= st.shed + 1e-6


def test_principal_spectrum_certified(spark, lowrank_df):
    from sgp_sketch.matrix import principal_spectrum

    df, A, _ = lowrank_df
    out = principal_spectrum(df, "vec", d=24, ell=10, k=3).toPandas()
    assert list(out.columns) == ["rank", "sing_value",
                                 "gram_error_bound", "n_rows"]
    assert out["rank"].tolist() == [1, 2, 3]
    sv = np.linalg.svd(A, compute_uv=False)[:3]
    shed = out["gram_error_bound"].iloc[0]
    for i in range(3):
        got = out["sing_value"].iloc[i]
        # slack: the query rounds sing_value to 4 decimals, which moves
        # sigma^2 by up to ~2*sigma*5e-5
        slack = 2 * sv[i] * 1e-4 + 1e-3
        assert got <= sv[i] + slack                    # never overestimates
        assert got ** 2 >= sv[i] ** 2 - shed - slack   # certified lower bound
    # rank-2 data, ell=10: the two real directions are near-exact
    assert np.allclose(out["sing_value"].iloc[:2], sv[:2], rtol=1e-2)


def test_fd_null_and_ragged_vectors_dropped(spark):
    from sgp_sketch.kernels import registry
    from sgp_sketch.matrix import fd_agg

    rows = [("a", [1.0, 2.0]), ("a", None), ("a", [3.0]),
            ("a", [0.5, 0.5])]
    df = spark.createDataFrame(rows, "g string, vec array<double>")
    blobs = fd_agg(df, "vec", d=2, ell=2).toPandas()
    st = registry.from_bytes(bytes(blobs["state"].iloc[0]))
    assert st.n_rows == 2  # null + wrong-length rows contributed nothing
    A = np.array([[1.0, 2.0], [0.5, 0.5]])
    assert np.linalg.norm(A.T @ A - st.gram(), 2) <= st.shed + 1e-9

def test_fd_grouped_with_nulls_aligns_codes(spark):
    """Regression: NULL/ragged vectors in a MULTI-group batch must not
    misalign the group-code mask (the kept-row mask filters codes too)."""
    from sgp_sketch.kernels import registry
    from sgp_sketch.matrix import fd_agg

    rows = [("a", [1.0, 0.0]), ("b", None), ("a", [3.0]),
            ("b", [0.0, 2.0]), ("a", [1.0, 0.0]), ("b", None)]
    df = spark.createDataFrame(rows, "g string, vec array<double>")
    blobs = fd_agg(df.coalesce(1), "vec", d=2, ell=2,
                   group_cols=("g",)).toPandas()
    sts = {r.g: registry.from_bytes(bytes(r.state))
           for r in blobs.itertuples()}
    assert sts["a"].n_rows == 2 and sts["b"].n_rows == 1
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    B = np.array([[0.0, 2.0]])
    assert np.linalg.norm(A.T @ A - sts["a"].gram(), 2) <= sts["a"].shed + 1e-9
    assert np.linalg.norm(B.T @ B - sts["b"].gram(), 2) <= sts["b"].shed + 1e-9
