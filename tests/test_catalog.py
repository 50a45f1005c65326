"""catalog.py: Iceberg-layout round-trip and resolution order."""

import json
import os

from sgp_sketch import catalog


def test_layout_roundtrip(spark, tokens_sdf, tmp_path):
    path = str(tmp_path / "tbl")
    manifest = catalog.write_layout(tokens_sdf, path,
                                    partition_by=["source"])
    assert manifest["n_files"] > 0
    assert os.path.exists(os.path.join(path, "metadata",
                                       "v1.metadata.json"))
    back = catalog.load_table(spark, path)
    assert back.count() == tokens_sdf.count()
    assert set(back.columns) == set(tokens_sdf.columns)


def test_snapshot_versioning(spark, tokens_sdf, tmp_path):
    path = str(tmp_path / "tbl")
    catalog.write_layout(tokens_sdf.limit(10), path)
    m2 = catalog.write_layout(tokens_sdf.limit(20), path)
    assert m2["version"] == 2
    with open(os.path.join(path, "metadata", "version-hint.text")) as fh:
        assert fh.read() == "2"
    with open(os.path.join(path, "metadata", "v2.metadata.json")) as fh:
        assert json.load(fh)["n_files"] == m2["n_files"]


def test_plain_parquet_fallback(spark, tokens_sdf, tmp_path):
    path = str(tmp_path / "plain")
    tokens_sdf.limit(5).write.parquet(path)
    assert catalog.load_table(spark, path).count() == 5


def test_layout_uri_scheme(spark, tokens_sdf, tmp_path):
    """Scheme-qualified layout paths work end-to-end (Hadoop FS gateway,
    same contract as the checkpoint store)."""
    path = "file://" + str(tmp_path / "uri_tbl")
    m = catalog.write_layout(tokens_sdf.limit(10), path)
    assert m["version"] == 1 and m["n_files"] > 0
    assert catalog.load_table(spark, path).count() == 10


def test_csv_resolution(spark, tokens_sdf, tmp_path):
    """S2 ingest through the catalog: '|'-separated CSV with header,
    explicit schema, reference-loader defaults."""
    path = str(tmp_path / "tbl.csv")
    (tokens_sdf.limit(12).selectExpr("doc_id", "n_tok", "source")
     .coalesce(1).write.options(header=True, sep="|").csv(path))
    back = catalog.load_table(spark, path,
                              schema="doc_id string, n_tok int, "
                                     "source string")
    assert back.count() == 12
    assert back.schema.simpleString() == \
        "struct<doc_id:string,n_tok:int,source:string>"
