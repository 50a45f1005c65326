"""sources.EdgeListDataSource: parallel text graph ingestion — range
ownership must partition the file exactly (every line read once) for
any chunk size, both layouts must parse, and malformed input must fail
loudly."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def edge_file(tmp_path_factory):
    rng = np.random.default_rng(3)
    edges = rng.integers(0, 1000, size=(5000, 2))
    p = tmp_path_factory.mktemp("graph") / "edges.txt"
    with open(p, "w") as f:
        f.write("# comment header\n")
        for s, d in edges:
            f.write(f"{s} {d}\n")
    return str(p), edges


def test_edge_layout_reads_every_line_once(spark, edge_file):
    from sgp_sketch import sources

    path, edges = edge_file
    sources.register(spark)
    # tiny chunks: dozens of ranges, lots of boundary crossings
    df = (spark.read.format("edgelist")
          .option("chunk_bytes", 512).load(path))
    got = df.toPandas().sort_values(["src", "dst"]).to_numpy()
    want = edges[np.lexsort((edges[:, 1], edges[:, 0]))]
    assert np.array_equal(got, want)


def test_range_ownership_partitions_file_exactly(edge_file):
    """Pure-python check across many chunk sizes: concatenating every
    range's owned block reproduces the file's data lines exactly."""
    from sgp_sketch.sources import _read_range
    import os

    path, _ = edge_file
    size = os.path.getsize(path)
    whole = open(path, "rb").read()
    for chunk in (1, 7, 64, 1000, size, size + 10):
        blocks = []
        for s in range(0, size, chunk):
            blocks.append(_read_range(path, s, min(s + chunk, size)))
        merged = b"".join(b if b.endswith(b"\n") or not b else b + b"\n"
                          for b in blocks)
        assert merged.replace(b"\n", b"") == whole.replace(b"\n", b"")
        # stronger: same multiset of lines
        assert sorted(merged.split(b"\n")) == sorted(whole.split(b"\n"))


def test_adjacency_layout(spark, tmp_path):
    from sgp_sketch import sources

    p = tmp_path / "adj.txt"
    p.write_text("# header\n1 3 10 11 12\n2 1 20\n3 0\n")
    sources.register(spark)
    df = (spark.read.format("edgelist").option("layout", "adj")
          .load(str(p)))
    got = sorted(map(tuple, df.collect()))
    assert got == [(1, 10), (1, 11), (1, 12), (2, 20)]


def test_filter_and_agg_compose(spark, edge_file):
    """The datasource output is a normal DataFrame: filters/aggregates
    compose (predicate evaluation happens Spark-side)."""
    from pyspark.sql import functions as F

    from sgp_sketch import sources

    path, edges = edge_file
    sources.register(spark)
    df = spark.read.format("edgelist").load(path)
    got = df.filter(F.col("src") < 100).groupBy().count().collect()[0][0]
    assert got == int((edges[:, 0] < 100).sum())


def test_malformed_inputs_raise(spark, tmp_path):
    from sgp_sketch import sources

    sources.register(spark)
    bad_edge = tmp_path / "bad.txt"
    bad_edge.write_text("1 2\n3\n")  # odd field count
    with pytest.raises(Exception, match="odd field count"):
        spark.read.format("edgelist").load(str(bad_edge)).collect()
    bad_adj = tmp_path / "bad_adj.txt"
    bad_adj.write_text("1 5 10 11\n")  # degree 5, two neighbors
    with pytest.raises(Exception, match="degree"):
        (spark.read.format("edgelist").option("layout", "adj")
         .load(str(bad_adj)).collect())
    long_adj = tmp_path / "long_adj.txt"
    long_adj.write_text("5 2 7 8 9\n")  # degree 2, THREE neighbors:
    with pytest.raises(Exception, match="degree"):  # silent tail drop
        (spark.read.format("edgelist").option("layout", "adj")  # loses edges
         .load(str(long_adj)).collect())
    with pytest.raises(Exception):
        spark.read.format("edgelist").option("layout", "zzz") \
            .load(str(bad_edge)).collect()

def test_gzip_files_read_whole(spark, edge_file, tmp_path):
    """.gz inputs are not splittable: one partition per file, same rows."""
    import gzip

    from sgp_sketch import sources

    path, edges = edge_file
    gz = tmp_path / "edges.txt.gz"
    with open(path, "rb") as fi, gzip.open(gz, "wb") as fo:
        fo.write(fi.read())
    sources.register(spark)
    df = spark.read.format("edgelist").load(str(gz))
    assert df.count() == len(edges)
    got = df.toPandas().sort_values(["src", "dst"]).to_numpy()
    want = edges[np.lexsort((edges[:, 1], edges[:, 0]))]
    assert np.array_equal(got, want)

def test_remote_uri_schemes_rejected(spark):
    """s3://... / hdfs://... must fail LOUDLY in partitions() — local
    os.path/glob resolution would otherwise glob-miss and silently
    return an empty DataFrame."""
    from sgp_sketch import sources

    sources.register(spark)
    for uri in ("s3://bucket/edges/*.txt", "hdfs://nn:8020/edges.txt"):
        with pytest.raises(Exception, match="unsupported URI scheme"):
            spark.read.format("edgelist").load(uri).collect()


def test_file_uri_scheme_accepted(spark, edge_file):
    from sgp_sketch import sources

    path, edges = edge_file
    sources.register(spark)
    df = spark.read.format("edgelist").load("file://" + path)
    assert df.count() == len(edges)


def test_directory_path_expands_to_files(spark, edge_file, tmp_path):
    """Regression: .load('/dir') must read the contained data files and
    skip _SUCCESS-style markers and dotfiles."""
    import shutil

    from sgp_sketch import sources

    path, edges = edge_file
    d = tmp_path / "edges_dir"
    d.mkdir()
    shutil.copy(path, d / "part-00000.txt")
    (d / "_SUCCESS").write_text("")
    (d / ".hidden").write_text("junk not numbers")
    (d / "nested_dir").mkdir()  # subdirectory: must be skipped, not
    (d / "nested_dir" / "x.txt").write_text("1 2\n")  # opened as a file
    sources.register(spark)
    df = spark.read.format("edgelist").load(str(d))
    assert df.count() == len(edges)


def test_ladj_layout_round_trip(spark, tmp_path):
    """Labeled LDBC-SNB adjacency (csv-converter.scala:40-74): out edges
    id→target, in edges source→id, optional ts, empty parts allowed."""
    from sgp_sketch import sources

    p = tmp_path / "ladj.txt"
    p.write_text(
        "# header\n"
        "person:1|knows,person:2,100 likes,post:9|knows,person:3,50\n"
        "person:2||\n"
        "tag:7|hasType,tagclass:1|\n")
    sources.register(spark)
    df = (spark.read.format("edgelist").option("layout", "ladj")
          .load(str(p)))
    got = sorted(map(tuple, df.collect()))
    assert got == [
        ("person:1", "person:2", "knows", 100, "out"),
        ("person:1", "post:9", "likes", None, "out"),
        ("person:3", "person:1", "knows", 50, "in"),
        ("tag:7", "tagclass:1", "hasType", None, "out"),
    ]


def test_ladj_ts_optional_and_missing(spark, tmp_path):
    from sgp_sketch import sources

    p = tmp_path / "ladj.txt"
    p.write_text("person:1|likes,post:2 likes,post:3,777|\n")
    sources.register(spark)
    rows = sorted(map(tuple,
                      spark.read.format("edgelist")
                      .option("layout", "ladj").load(str(p)).collect()))
    assert rows == [("person:1", "post:2", "likes", None, "out"),
                    ("person:1", "post:3", "likes", 777, "out")]


def test_ladj_elabel_predicate_at_scan(spark, tmp_path):
    """EdgeCutSGP.java:84-92: labels outside the IN-set are dropped
    during ingest, before any edge materializes."""
    from sgp_sketch import sources

    p = tmp_path / "ladj.txt"
    p.write_text("person:1|knows,person:2,1 likes,post:9,2|"
                 "replyOf,comment:4,3\n")
    sources.register(spark)
    df = (spark.read.format("edgelist").option("layout", "ladj")
          .option("elabels", "knows,replyOf").load(str(p)))
    got = sorted(r.elabel for r in df.collect())
    assert got == ["knows", "replyOf"]


def test_ladj_boundary_crossing_chunks(spark, tmp_path):
    """Exactly-once ranged reads hold for the ladj layout too: tiny
    chunks force many line-boundary crossings."""
    import numpy as np

    from sgp_sketch import sources

    rng = np.random.default_rng(7)
    lines = []
    n_out = 0
    for v in range(300):
        outs = " ".join(f"knows,person:{rng.integers(0, 300)},{i}"
                        for i in range(rng.integers(0, 4)))
        n_out += len(outs.split()) if outs else 0
        lines.append(f"person:{v}|{outs}|")
    p = tmp_path / "ladj.txt"
    p.write_text("\n".join(lines) + "\n")
    sources.register(spark)
    df = (spark.read.format("edgelist").option("layout", "ladj")
          .option("chunk_bytes", 256).load(str(p)))
    assert df.count() == n_out


def test_ladj_malformed_raises(spark, tmp_path):
    from sgp_sketch import sources

    sources.register(spark)
    p = tmp_path / "bad.txt"
    p.write_text("person:1|knows,person:2\n")  # only 2 parts, not 3
    with pytest.raises(Exception, match="ladj"):
        (spark.read.format("edgelist").option("layout", "ladj")
         .load(str(p)).collect())
    p2 = tmp_path / "bad2.txt"
    p2.write_text("person:1|knows|\n")  # edge token missing target
    with pytest.raises(Exception, match="ladj"):
        (spark.read.format("edgelist").option("layout", "ladj")
         .load(str(p2)).collect())
    # 4 |-parts must raise, not be glued into the in-edges block (a
    # maxsplit=2 parse would silently ingest 'b|junk' as a vertex id)
    p3 = tmp_path / "bad3.txt"
    p3.write_text("u1|knows,a,1|likes,b,2|junk,c,3\n")
    with pytest.raises(Exception, match="ladj"):
        (spark.read.format("edgelist").option("layout", "ladj")
         .load(str(p3)).collect())


def test_elabels_rejected_outside_ladj(spark, tmp_path):
    from sgp_sketch import sources

    sources.register(spark)
    p = tmp_path / "e.txt"
    p.write_text("1 2\n")
    with pytest.raises(Exception, match="elabels"):
        (spark.read.format("edgelist").option("elabels", "knows")
         .load(str(p)).collect())


def test_edge_ts_layout_mixed_arity(spark, tmp_path):
    """csv-converter.scala:31-34's optional time_stamp column: 2- and
    3-field rows mix; missing ts is NULL, not an error."""
    from sgp_sketch import sources

    p = tmp_path / "ets.txt"
    p.write_text("# c\n1 2 1000\n3 4\n5 6 2000\n")
    sources.register(spark)
    df = (spark.read.format("edgelist").option("layout", "edge_ts")
          .load(str(p)))
    got = sorted(map(tuple, df.collect()))
    assert got == [(1, 2, 1000), (3, 4, None), (5, 6, 2000)]


def test_edge_ts_malformed_raises(spark, tmp_path):
    from sgp_sketch import sources

    sources.register(spark)
    p = tmp_path / "bad.txt"
    p.write_text("1 2 3 4\n")
    with pytest.raises(Exception, match="edge_ts"):
        (spark.read.format("edgelist").option("layout", "edge_ts")
         .load(str(p)).collect())
    # non-integer field: the vectorized S->int64 cast must raise the
    # layout's own error, not a bare numpy one
    p2 = tmp_path / "bad2.txt"
    p2.write_text("1 2 1000\n3 x\n")
    with pytest.raises(Exception, match="edge_ts"):
        (spark.read.format("edgelist").option("layout", "edge_ts")
         .load(str(p2)).collect())


def test_edge_ts_parse_unit_vectorized():
    """Direct unit check of the vectorized mixed-arity parser: ordering
    preserved, ts NULLs where the third field is absent, comments and
    blanks skipped."""
    from sgp_sketch.sources import _parse_edges_ts

    src, dst, ts = _parse_edges_ts(
        b"# hdr\n10 20\n30 40 7\n\n50 60\n70 80 9")
    assert src.tolist() == [10, 30, 50, 70]
    assert dst.tolist() == [20, 40, 60, 80]
    assert [None if t is None else int(t) for t in ts] == [None, 7, None, 9]
    e_src, e_dst, e_ts = _parse_edges_ts(b"")
    assert len(e_src) == 0 and len(e_dst) == 0 and e_ts == []
