"""Deterministic training-shard export (operators/packing.py).

The contract query `training_shards` carries the DuckDB value-hash
signal for the manifest; these tests cover what the oracle can't see —
the WRITTEN artifact: exact-once doc coverage, file row order equal to
the manifest's training order, manifest-vs-written verification, and
invariance of the whole thing to the input's physical partitioning.
"""

import pyspark.sql.functions as F
import pytest

from sketch_spark.operators.packing import (
    export_training_shards,
    shard_assignment,
    shard_manifest,
)


@pytest.fixture(scope="module")
def docs(spark, sf001):
    return spark.read.parquet(f"{sf001}/documents.parquet")


def test_export_exact_once_and_ordered(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    manifest = export_training_shards(docs, path, n_shards=4).toPandas()
    written = spark.read.parquet(path)

    # exact-once: same id multiset
    assert written.count() == docs.count()
    assert written.select("doc_id").distinct().count() == docs.count()

    # per-shard doc sets and sizes match the manifest
    got = (
        written.groupBy("shard")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .toPandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    assert got["n_docs"].tolist() == manifest["n_docs"].tolist()

    # within-file row order IS the training order: for each shard the
    # file order must equal (u_order, id) ascending
    a = shard_assignment(docs, 4).select("shard", "_ord", "doc_id").toPandas()
    for shard in sorted(a["shard"].unique()):
        expect = (
            a[a["shard"] == shard]
            .sort_values(["_ord", "doc_id"])["doc_id"]
            .tolist()
        )
        # spark preserves parquet row order within a file scan of one dir
        file_order = (
            spark.read.parquet(f"{path}/shard={shard}")
            .select("doc_id")
            .toPandas()["doc_id"]
            .tolist()
        )
        assert file_order == expect


def test_manifest_verifies_written_shards(spark, docs, tmp_path):
    """Recomputing the manifest from the WRITTEN table reproduces the
    original fingerprints — the resume/integrity check a 10^12-doc
    export would run per shard before trusting it."""
    path = str(tmp_path / "shards")
    manifest = export_training_shards(docs, path, n_shards=4).toPandas()
    written = spark.read.parquet(path).drop("shard")
    again = shard_manifest(written, n_shards=4).toPandas()
    assert manifest["fingerprint"].tolist() == again["fingerprint"].tolist()
    assert manifest["n_tokens"].tolist() == again["n_tokens"].tolist()


def test_manifest_partitioning_invariant(docs):
    base = shard_manifest(docs, n_shards=4).toPandas()
    weird = shard_manifest(docs.repartition(13, "lang"), n_shards=4).toPandas()
    assert base.equals(weird)


def test_assignment_balance(docs):
    """md5 shard assignment is uniform enough that no shard exceeds
    2x the mean at n=500 (the skew guarantee the export leans on)."""
    counts = (
        shard_assignment(docs, 8)
        .groupBy("shard")
        .count()
        .toPandas()["count"]
    )
    assert len(counts) == 8
    assert counts.max() <= 2 * counts.mean()
