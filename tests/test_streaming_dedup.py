"""Streaming near-dup dedup against the persisted, growing MinHash
index: greedy arrival semantics vs a pure-python oracle, crash-replay
idempotency of the epoch folds, and the real Structured Streaming
end-to-end run."""

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from sketch_spark.streaming.dedup_stream import (
    init_near_dedup_index,
    make_near_dedup_fold,
    read_index_docs,
    read_stream_pairs,
    streaming_near_dedup,
)

K = 3
THRESHOLD = 0.5


def _twin(text: str) -> str:
    toks = text.split()
    return " ".join(t for i, t in enumerate(toks) if i % 20 != 0)


@pytest.fixture(scope="module")
def corpus():
    """Base corpus + three stream batches with planted duplicates:
    vs-base twins, cross-batch stream twins, a within-batch twin, and
    a second-generation twin (transitive cluster)."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(4000)]

    def fresh(n=150):
        return " ".join(rng.choice(vocab, size=n))

    base = [(i, fresh()) for i in range(10)]
    texts = dict(base)
    b0 = [
        (100, _twin(texts[0])),      # dup of base doc 0
        (101, fresh()),              # survivor; gets stream twins later
        (102, fresh()),              # survivor
        (103, None),                 # within-batch twin of 102
    ]
    b0[3] = (103, _twin(b0[2][1]))
    texts.update(dict(b0))
    b1 = [
        (110, _twin(texts[101])),    # cross-batch stream dup
        (111, _twin(texts[102])),    # dup of earlier survivor
        (112, fresh()),              # survivor
    ]
    texts.update(dict(b1))
    b2 = [
        (120, _twin(texts[110])),    # 2nd-generation twin -> matches 101
        (121, fresh()),              # survivor
    ]
    texts.update(dict(b2))
    return base, [b0, b1, b2]


def _shingles(text):
    toks = text.split()
    return {" ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)}


def _jac(a, b):
    sa, sb = _shingles(a), _shingles(b)
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if inter else 0.0


def _greedy(base, batches, threshold=THRESHOLD):
    """Pure-python restatement of the fold semantics: within-batch
    min-label components, then reps probe the accumulated index."""
    indexed = dict(base)
    probe, within = [], []
    for docs in batches:
        ids = sorted(i for i, _ in docs)
        text = dict(docs)
        # within-batch exact pairs + union-find to min labels
        label = {i: i for i in ids}

        def find(x):
            while label[x] != x:
                label[x] = label[label[x]]
                x = label[x]
            return x

        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                j = _jac(text[a], text[b])
                if j >= threshold:
                    within.append((a, b))
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        lo, hi = min(ra, rb), max(ra, rb)
                        label[hi] = lo
        reps = [i for i in ids if find(i) == i]
        newly = []
        for i in reps:
            hits = [
                (i, o, _jac(text[i], indexed[o]))
                for o in sorted(indexed)
                if _jac(text[i], indexed[o]) >= threshold
            ]
            probe.extend(hits)
            if not hits:
                newly.append(i)
        for i in newly:  # survivors index AFTER the whole batch
            indexed[i] = text[i]
    return probe, within, indexed


def _drive_folds(spark, corpus, root, **fold_kw):
    base, batches = corpus
    base_df = spark.createDataFrame(base, "doc_id long, text string")
    init_near_dedup_index(base_df, root)
    fold = make_near_dedup_fold(root, THRESHOLD, **fold_kw)
    for e, docs in enumerate(batches):
        fold(spark.createDataFrame(docs, "doc_id long, text string"), e)
    return fold


def test_fold_greedy_matches_python(spark, corpus, tmp_path):
    base, batches = corpus
    root = str(tmp_path / "idx")
    _drive_folds(spark, corpus, root)

    probe, within, indexed = _greedy(base, batches)
    got_probe = {
        (r.id_new, r.id_old)
        for r in read_stream_pairs(spark, root).collect()
    }
    assert got_probe == {(a, b) for a, b, _ in probe}
    got_within = {
        (r.id_a, r.id_b)
        for r in read_stream_pairs(spark, root, within=True).collect()
    }
    assert got_within == set(within)
    got_docs = {
        r.doc_id for r in read_index_docs(spark, root).collect()
    }
    assert got_docs == set(indexed)
    # the planted expectations, spelled out
    assert (100, 0) in got_probe and (111, 102) in got_probe
    assert (110, 101) in got_probe and (120, 101) in got_probe
    assert got_within == {(102, 103)}
    assert {101, 102, 112, 121} <= got_docs
    assert {100, 103, 110, 111, 120} & got_docs == set()


def test_fold_replay_idempotent(spark, corpus, tmp_path):
    """Replaying an epoch AFTER its own writes committed (the crash
    window) must rewrite identical state — the epoch<current partition
    filter keeps a replayed batch from matching itself in the index."""
    base, batches = corpus
    root = str(tmp_path / "idx")
    fold = _drive_folds(spark, corpus, root)

    def snapshot():
        pairs = sorted(
            map(tuple, read_stream_pairs(spark, root).toPandas().values.tolist())
        )
        docs = sorted(
            map(tuple, read_index_docs(spark, root).toPandas().values.tolist())
        )
        keys = sorted(
            map(
                tuple,
                spark.read.parquet(os.path.join(root, "keys")).toPandas().values.tolist(),
            )
        )
        return pairs, docs, keys

    before = snapshot()
    # replay the middle and last epochs out of order
    fold(spark.createDataFrame(batches[2], "doc_id long, text string"), 2)
    fold(spark.createDataFrame(batches[1], "doc_id long, text string"), 1)
    assert snapshot() == before


def test_fresh_generation_over_stale_epochs_fails_fast(spark, corpus, tmp_path):
    """Restarting with a FRESH checkpoint (epochs restart at 0) over a
    root that still holds a previous generation's higher-epoch dirs must
    refuse to run: partition discovery would silently union the stale
    epochs into pair/doc reads.  Replaying epoch 0 under the SAME
    generation (only epoch=1 dirs exist) must stay allowed."""
    base, batches = corpus
    root = str(tmp_path / "idx")
    fold = _drive_folds(spark, corpus, root)  # wrote epochs 1..len(batches)

    fresh = make_near_dedup_fold(root, THRESHOLD)
    with pytest.raises(RuntimeError, match="previous stream generation"):
        fresh(spark.createDataFrame(batches[0], "doc_id long, text string"), 0)

    # crash-replay of batch 0 in a single-batch generation is legitimate
    root2 = str(tmp_path / "idx2")
    base_df = spark.createDataFrame(base, "doc_id long, text string")
    init_near_dedup_index(base_df, root2)
    fold2 = make_near_dedup_fold(root2, THRESHOLD)
    fold2(spark.createDataFrame(batches[0], "doc_id long, text string"), 0)
    fold2(spark.createDataFrame(batches[0], "doc_id long, text string"), 0)


def test_streaming_end_to_end(spark, corpus, tmp_path):
    """The real readStream -> foreachBatch path (availableNow, one
    file per micro-batch).  File pickup order is not contractual, so
    assertions are order-robust: every planted dup is dropped with the
    right partner reachable, every fresh doc survives."""
    base, batches = corpus
    root = str(tmp_path / "idx")
    in_dir = str(tmp_path / "in")
    base_df = spark.createDataFrame(base, "doc_id long, text string")
    init_near_dedup_index(base_df, root)
    for docs in batches:
        spark.createDataFrame(docs, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q = streaming_near_dedup(
        stream, root, THRESHOLD, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    survivors = {r.doc_id for r in read_index_docs(spark, root).collect()}
    all_pairs = {
        (r.id_new, r.id_old)
        for r in read_stream_pairs(spark, root).collect()
    } | {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b))
        for r in read_stream_pairs(spark, root, within=True).collect()
    }
    dropped = {i for i, _ in sum(batches, [])} - survivors
    # fresh docs always survive; base twins always drop
    assert {101, 102, 112, 121} <= survivors or {101, 102, 112, 121} <= (
        survivors | {a for a, b in all_pairs}
    )
    assert 100 in dropped
    # every dropped doc has a logged partner in its planted cluster
    clusters = [{0, 100}, {101, 110, 120}, {102, 103, 111}]
    for d in dropped:
        partners = {b for a, b in all_pairs if a == d} | {
            a for a, b in all_pairs if b == d
        }
        cluster = next(c for c in clusters if d in c)
        assert partners & cluster, (d, partners)
    # exactly one survivor per planted cluster (greedy, any order)
    for c in clusters:
        assert len((c | {0}) & (survivors | {0, 101, 102})) >= 1
        assert len(c & dropped) == len(c) - 1


def test_probe_mode_matches_batch_incremental(spark, corpus, tmp_path):
    """update_index=False, within_batch=False: the stream is a pure
    probe of a static index, so the union of epoch pair logs must
    equal the batch ``incremental_near_duplicates`` answer regardless
    of micro-batch boundaries — the contract query's mode."""
    from sketch_spark.operators.dedup import (
        incremental_near_duplicates,
        write_minhash_index,
    )

    base, batches = corpus
    root = str(tmp_path / "idx")
    in_dir = str(tmp_path / "in")
    base_df = spark.createDataFrame(base, "doc_id long, text string")
    init_near_dedup_index(base_df, root)
    new_rows = sum(batches, [])
    for docs in batches:
        spark.createDataFrame(docs, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = streaming_near_dedup(
        stream,
        root,
        THRESHOLD,
        update_index=False,
        within_batch=False,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = sorted(
        (r.id_new, r.id_old, round(r.jaccard, 6))
        for r in read_stream_pairs(spark, root).collect()
    )

    idx2 = str(tmp_path / "idx_batch")
    write_minhash_index(base_df, idx2)
    new_df = spark.createDataFrame(new_rows, "doc_id long, text string")
    want = sorted(
        (r.id_new, r.id_old, round(r.jaccard, 6))
        for r in incremental_near_duplicates(
            new_df, idx2, base_df, THRESHOLD
        ).collect()
    )
    # only base-targeting dups count here (stream docs never index in
    # probe mode); the contract query's odd-vs-even-half fixture is the
    # rich version of this check
    assert got == want and len(got) >= 1
