"""The spark-submit --py-files launch path (north_rule clause), exercised
for real: a subprocess spark-submit run of scripts/run_job.py with the
package shipped ONLY via --py-files (cwd outside the repo), plus
in-process CLI tests for the other subcommands."""

import json
import os
import subprocess
import sys

import pytest


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF001 = "/root/testdata/sf0.001/documents.parquet"


def test_spark_submit_py_files_build(tmp_path):
    import pyspark

    from sketch_spark.session import package_zip

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    out = str(tmp_path / "states_out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    res = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", package_zip(),
            os.path.join(REPO, "scripts", "run_job.py"),
            "build",
            "--input", SF001,
            "--out", out,
            "--kinds", "cmcu,hll",
            "--group-by", "lang",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # NOT the repo: imports must come from --py-files
        env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["states"] == 2 * 5  # 2 specs x 5 langs
    assert os.path.exists(os.path.join(out, "metrics.json"))

    # the written state table round-trips into working sketches
    from sketch_spark.core import sketch_from_bytes

    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(out, "states")).to_pylist()
    hll = [r for r in tbl if r["spec"] == "hll"]
    assert len(hll) == 5
    sk = sketch_from_bytes(hll[0]["state"])
    assert sk.estimate() > 0


def test_cli_estimate_roundtrip(spark, tmp_path, monkeypatch):
    from sketch_spark import cli

    out = str(tmp_path / "states")
    cli.main([
        "build", "--input", SF001, "--out", out, "--kinds", "cmcu",
    ])
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        cli.main(["estimate", "--states", out, "--spec", "cmcu", "--tokens", "the,zzzz"])
    est = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert set(est) == {"the", "zzzz"}
    assert est["the"] >= 0 and est["zzzz"] >= 0


def test_cli_build_ckpt_resume(spark, tmp_path):
    from sketch_spark import cli
    from sketch_spark.operators.checkpoint import CheckpointedSketchJob, SimulatedFailure

    ckpt = str(tmp_path / "ckpt")
    # kill a direct run mid-way, then the CLI resume completes the rest
    df = spark.read.parquet(SF001)
    specs = cli._specs("cmcu", "text", 1, None)
    job = CheckpointedSketchJob(df, specs, ckpt, key_col="doc_id", n_buckets=8, wave_size=2)
    with pytest.raises(SimulatedFailure):
        job.run(fail_after_waves=2)
    assert 0 < len(job.completed_buckets()) < 8
    cli.main([
        "build-ckpt", "--input", SF001, "--out", ckpt,
        "--kinds", "cmcu", "--key-col", "doc_id", "--n-buckets", "8",
    ])
    res = CheckpointedSketchJob(df, specs, ckpt, key_col="doc_id", n_buckets=8).result(
        validate_lineage=True
    )
    assert res.metrics[("cmcu",)]["n_rows"] == df.count()


def test_cli_warc_ingest(spark, pages_pdf, tmp_path):
    import io
    import json as _json
    from contextlib import redirect_stdout

    from sketch_spark import cli
    from sketch_spark.sources.pages import wrap_html
    from sketch_spark.sources.warc import write_warc

    pages, _ = pages_pdf
    recs = [
        (r.url, str(r.warc_ts).replace(" ", "T") + "Z", wrap_html(r.url, r.text))
        for _, r in pages.head(50).iterrows()
    ]
    write_warc(str(tmp_path / "seg.warc.gz"), recs, compress=True)
    out = str(tmp_path / "pages_out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli.main(["warc-ingest", "--input", str(tmp_path / "seg.warc.gz"), "--out", out])
    assert _json.loads(buf.getvalue().strip().splitlines()[-1])["pages"] == 50
    got = spark.read.parquet(out).toPandas().set_index("url")
    src = pages.head(50).set_index("url")
    for u in list(src.index)[:10]:
        assert got.loc[u, "text"] == src.loc[u, "text"]  # byte-identical extraction


def test_cli_tune_lsh(capsys):
    from sketch_spark import cli

    cli.main(["tune-lsh", "--threshold", "0.6", "--num-perm", "64"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (out["bands"], out["rows_per_band"]) == (10, 6)


def test_cli_index_build_probe_stream(spark, sf001, tmp_path, capsys):
    """The incremental-dedup workflow end to end through the CLI:
    index-build (auto bands) -> index-probe -> stream-dedup in probe
    mode over the same batch, which must find the same pair count."""
    from sketch_spark import cli
    from sketch_spark.streaming.dedup_stream import init_near_dedup_index

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    old_dir, new_dir = str(tmp_path / "old"), str(tmp_path / "new")
    docs.filter("doc_id % 2 = 0").write.parquet(old_dir)
    docs.filter("doc_id % 2 = 1").repartition(4).write.parquet(new_dir)

    idx = str(tmp_path / "mh_idx")
    cli.main([
        "index-build", "--input", old_dir, "--index", idx,
        "--bands", "auto", "--threshold", "0.4",
    ])
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["bands"] == 16  # choose_lsh_params(0.4, 64)

    pairs_out = str(tmp_path / "pairs")
    cli.main([
        "index-probe", "--input", new_dir, "--index", idx,
        "--old-docs", old_dir, "--out", pairs_out, "--threshold", "0.4",
    ])
    probed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert probed["pairs"] >= 1

    root = str(tmp_path / "stream_idx")
    init_near_dedup_index(
        spark.read.parquet(old_dir), root, bands=built["bands"]
    )
    cli.main([
        "stream-dedup", "--input", new_dir, "--index-root", root,
        "--threshold", "0.4", "--no-update-index", "--no-within-batch",
    ])
    streamed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert streamed["pairs"] == probed["pairs"]


def test_cli_decode(spark, tmp_path, capsys):
    """The decode subcommand over a mixed image table: real PNG/PPM
    decode through the CLI surface, corrupt blob skipped."""
    import hashlib

    import numpy as np

    from sketch_spark import cli
    from sketch_spark.functions.multimodal import encode_png

    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 256, size=4 * 3 * 3, dtype=np.uint8).tobytes()
    rows = [
        ("png", bytearray(encode_png(rgb, 4, 3, filter_type=2))),
        ("ppm", bytearray(b"P6\n4 3\n255\n" + rgb)),
        ("bad", bytearray(b"corrupt!")),
    ]
    src = str(tmp_path / "blobs")
    spark.createDataFrame(rows, "url string, image binary").write.parquet(src)
    out = str(tmp_path / "decoded")
    cli.main(["decode", "images", "--input", src, "--out", out])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got == {"rows": 2}
    pdf = spark.read.parquet(out).toPandas().set_index("url")
    want = hashlib.md5(rgb.hex().encode()).hexdigest()
    assert pdf.loc["png"].pixel_md5 == want and pdf.loc["ppm"].pixel_md5 == want
    assert set(pdf.format) == {"png", "ppm"}


def test_cli_media_dedup_kinds(spark, tmp_path, capsys):
    """The decode subcommand's media-dedup kinds: the same pixels
    through PNG and PPM containers group under image-dups, and a
    re-rated PCM twin pairs under audio-near-dups."""
    import struct

    import numpy as np

    from sketch_spark import cli
    from sketch_spark.functions.multimodal import encode_png

    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, size=5 * 4 * 3, dtype=np.uint8).tobytes()
    img_rows = [
        ("a", bytearray(encode_png(rgb, 5, 4, filter_type=1))),
        ("b", bytearray(b"P6\n5 4\n255\n" + rgb)),
        ("c", bytearray(b"corrupt!")),
    ]
    img_src = str(tmp_path / "imgs")
    spark.createDataFrame(img_rows, "url string, image binary").write.parquet(img_src)
    out1 = str(tmp_path / "imgdups")
    cli.main(["decode", "image-dups", "--input", img_src, "--out", out1])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got == {"rows": 1}
    row = spark.read.parquet(out1).collect()[0]
    assert row.n_copies == 2 and row.survivor == "a"

    s = (rng.integers(-64, 64, size=120) << 8).astype(np.int64)

    def wav(vals):
        data = b"".join(struct.pack("<h", int(v)) for v in vals)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        return bytearray(
            b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    aud_rows = [("x", wav(s)), ("y", wav(np.repeat(s, 2))), ("z", bytearray(b"!"))]
    aud_src = str(tmp_path / "auds")
    spark.createDataFrame(aud_rows, "url string, audio binary").write.parquet(aud_src)
    out2 = str(tmp_path / "auddups")
    cli.main(
        ["decode", "audio-near-dups", "--input", aud_src, "--out", out2,
         "--bin-col", "audio"]
    )
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got == {"rows": 1}
    pair = spark.read.parquet(out2).collect()[0]
    assert (pair.id_a, pair.id_b, pair.hamming) == ("x", "y", 0)


def test_cli_pagerank(spark, tmp_path, capsys):
    from sketch_spark import cli
    from sketch_spark.operators.graph import pagerank_reference

    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10)]
    edges_pq = str(tmp_path / "edges")
    seeds_pq = str(tmp_path / "seeds")
    spark.createDataFrame(edges, "src long, dst long").write.parquet(edges_pq)
    spark.createDataFrame([(0,)], "node long").write.parquet(seeds_pq)

    out = str(tmp_path / "ranks")
    cli.main(["pagerank", "--input", edges_pq, "--out", out, "--iters", "8"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary == {"nodes": 5, "zero_rank": 0}
    got = {r["node"]: r["rank_units"] for r in spark.read.parquet(out).collect()}
    assert got == pagerank_reference(edges, n_iter=8)

    out2 = str(tmp_path / "trust")
    cli.main([
        "pagerank", "--input", edges_pq, "--out", out2,
        "--iters", "8", "--teleport", seeds_pq,
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary == {"nodes": 5, "zero_rank": 2}  # the 10-11 island starves
    got = {r["node"]: r["rank_units"] for r in spark.read.parquet(out2).collect()}
    assert got == pagerank_reference(edges, n_iter=8, teleport={0})


def test_cli_line_dedup_vocab_fd(spark, tmp_path, capsys):
    from sketch_spark import cli

    docs = [
        (1, "the shared banner line here\nalpha beta"),
        (2, "the shared banner line here\ngamma delta"),
        (3, "unique page body entirely"),
    ]
    docs_pq = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(docs_pq)

    out = str(tmp_path / "clean")
    cli.main([
        "line-dedup", "--input", docs_pq, "--out", out,
        "--min-docs", "2", "--min-chars", "10",
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary == {"docs": 3, "lines_removed": 2}
    got = {r["doc_id"]: r["clean_text"] for r in spark.read.parquet(out).collect()}
    assert got[1] == "alpha beta" and got[3] == "unique page body entirely"

    cli.main(["vocab-coverage", "--input", docs_pq, "--ppm", "1000000"])
    curve = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["curve"]
    n_types = len({t for _, s in docs for t in s.replace("\n", " ").split()})
    assert curve[0]["vocab_size"] == n_types  # 100% coverage = whole vocab

    vecs = [(i, [float(i), 1.0]) for i in range(10)]
    vec_pq = str(tmp_path / "vecs")
    spark.createDataFrame(vecs, "vec_id long, embedding array<float>").write.parquet(vec_pq)
    cli.main(["fd-spectrum", "--input", vec_pq, "--ell", "4", "--k", "2"])
    spec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["spectrum"]
    assert spec[0]["n_rows"] == 10 and spec[0]["component"] == 1


def test_cli_line_dedup_paragraph_sep(spark, tmp_path, capsys):
    from sketch_spark import cli

    para = "shared footer line one\nshared footer line two"
    docs = [(1, f"body one\n\n{para}"), (2, f"body two here\n\n{para}")]
    docs_pq = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(docs_pq)
    out = str(tmp_path / "clean")
    cli.main([
        "line-dedup", "--input", docs_pq, "--out", out,
        "--min-docs", "2", "--min-chars", "10", "--sep", r"\n\n",
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary == {"docs": 2, "lines_removed": 2}
    got = {r["doc_id"]: r["clean_text"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "body one", 2: "body two here"}
