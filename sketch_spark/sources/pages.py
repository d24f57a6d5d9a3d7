"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Schema matches BASELINE.json input_hint exactly:
  url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Properties the tests and benchmarks rely on:
* fully deterministic from ``seed`` (numpy PCG64; no wall clock);
* two disjoint crawl windows — control (July 2025) and test (August
  2025) — the web-scale analogue of the reference's control/test FASTA
  pair (/root/reference/src/sketch.cpp:87-90);
* host-skewed urls (Zipf) per north_star's heavy-hitter skew clause;
* ``html`` is an invertible template wrap of ``text`` so
  ``extract_text(html) == text`` **byte-identical** (input_hint
  per-row invariant; tested);
* planted heavy-hitter tokens with exact known counts per window
  (ground-truth sidecar) — "emerging" tokens appear overwhelmingly in
  the test window, "stable" tokens equally in both, giving the
  emerging-HH pipeline a known right answer.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

CONTROL_START = np.datetime64("2025-07-01T00:00:00")
TEST_START = np.datetime64("2025-08-01T00:00:00")
WINDOW_DAYS = 14

LANGS = np.array(["en", "es", "de", "fr", "zh"])
LANG_W = np.array([0.55, 0.15, 0.12, 0.10, 0.08])


@dataclass
class PlantedToken:
    token: str
    test_count: int
    control_count: int


def default_planted(n_emerge: int = 5, n_stable: int = 5) -> list[PlantedToken]:
    planted = []
    for i in range(n_emerge):
        planted.append(PlantedToken(f"hhemerge{i}", 400 + 50 * i, 5 + i))
    for i in range(n_stable):
        planted.append(PlantedToken(f"hhstable{i}", 300 + 20 * i, 300 + 20 * i))
    return planted


def _escape(text: bytes) -> bytes:
    return text.replace(b"&", b"&amp;").replace(b"<", b"&lt;").replace(b">", b"&gt;")


def _unescape(text: bytes) -> bytes:
    return text.replace(b"&gt;", b">").replace(b"&lt;", b"<").replace(b"&amp;", b"&")


_PRE = b"<html><head><title>"
_MID = b"</title></head><body><p>"
_POST = b"</p></body></html>"


def wrap_html(url: str, text: str) -> bytes:
    return _PRE + _escape(url.encode()) + _MID + _escape(text.encode()) + _POST


def extract_text_bytes(html: bytes) -> bytes:
    """Invert ``wrap_html`` — byte-identical to the original text."""
    start = html.index(_MID) + len(_MID)
    end = html.rindex(_POST)
    return _unescape(html[start:end])


def wrap_html_col(url, text):
    """Catalyst mirror of ``wrap_html``: html:binary built JVM-side
    (concat + replace + encode, whole-stage codegen — no Python)."""
    from pyspark.sql import functions as F

    def esc(c):
        c = F.col(c) if isinstance(c, str) else c
        c = F.replace(c, F.lit("&"), F.lit("&amp;"))
        c = F.replace(c, F.lit("<"), F.lit("&lt;"))
        return F.replace(c, F.lit(">"), F.lit("&gt;"))

    s = F.concat(
        F.lit(_PRE.decode()), esc(url), F.lit(_MID.decode()), esc(text), F.lit(_POST.decode())
    )
    return F.encode(s, "UTF-8")


def extract_text_col(html):
    """Catalyst mirror of ``extract_text_bytes`` — byte-identical text
    from the ``html:binary`` wrap (input_hint per-row invariant), as a
    pure JVM expression usable at scan speed on 10^12 rows.

    The marker literals contain '<', which escaped content cannot, so
    first/last occurrence coincide and ``substring_index`` is exact;
    unescape order (gt, lt, amp) matches ``_unescape``.
    """
    from pyspark.sql import functions as F

    c = F.col(html) if isinstance(html, str) else html
    s = F.decode(c, "UTF-8")
    inner = F.substring_index(
        F.substring_index(s, _POST.decode(), 1), _MID.decode(), -1
    )
    u = F.replace(inner, F.lit("&gt;"), F.lit(">"))
    u = F.replace(u, F.lit("&lt;"), F.lit("<"))
    u = F.replace(u, F.lit("&amp;"), F.lit("&"))
    return F.encode(u, "UTF-8")


def generate_pages(
    n_rows: int,
    seed: int = 42,
    n_hosts: int = 200,
    vocab: int = 20_000,
    planted: list[PlantedToken] | None = None,
    with_html: bool = True,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (pages_df, sidecar_df).

    sidecar: one row per planted token — token, test_count,
    control_count (exact ground truth).
    """
    rng = np.random.default_rng(seed)
    if planted is None:
        planted = default_planted()

    # hosts: Zipf-skewed
    host_ids = rng.zipf(1.2, size=n_rows * 2)
    host_ids = host_ids[host_ids <= n_hosts][:n_rows]
    while len(host_ids) < n_rows:  # top-up (zipf tail rejection)
        extra = rng.zipf(1.2, size=n_rows)
        extra = extra[extra <= n_hosts]
        host_ids = np.concatenate([host_ids, extra])[:n_rows]
    path_ctr = np.arange(n_rows)
    urls = np.array(
        [f"https://host{h}.example.com/p/{c}" for h, c in zip(host_ids, path_ctr)]
    )

    # window split: deterministic round-robin by row
    is_test = np.arange(n_rows) % 2 == 1
    day_off = rng.integers(0, WINDOW_DAYS, n_rows)
    sec_off = rng.integers(0, 86_400, n_rows)
    base = np.where(is_test, TEST_START, CONTROL_START)
    warc_ts = base + day_off * np.timedelta64(86_400, "s") + sec_off * np.timedelta64(1, "s")

    lang = LANGS[rng.choice(len(LANGS), size=n_rows, p=LANG_W)]

    # organic text: Zipf tokens over the vocab
    doc_len = 50 + (np.arange(n_rows) * 2654435761 % 451)  # deterministic LCG-ish [50, 500]
    token_ids = rng.zipf(1.07, size=int(doc_len.sum()) * 2)
    token_ids = token_ids[token_ids <= vocab]
    token_strs = np.char.add("w", token_ids.astype("U8"))
    docs: list[list[str]] = []
    off = 0
    for dl in doc_len:
        docs.append(token_strs[off : off + dl].tolist())
        off += dl

    # plant heavy hitters: spread occurrences round-robin over the
    # window's docs (deterministic) — exact per-window counts
    test_idx = np.flatnonzero(is_test)
    ctrl_idx = np.flatnonzero(~is_test)
    for pi, p in enumerate(planted):
        for count, idxs in ((p.test_count, test_idx), (p.control_count, ctrl_idx)):
            if len(idxs) == 0:
                continue
            targets = idxs[(pi * 7919 + np.arange(count)) % len(idxs)]
            for t in targets:
                docs[t].append(p.token)

    texts = np.array([" ".join(d) for d in docs], dtype=object)
    html = (
        np.array([wrap_html(u, t) for u, t in zip(urls, texts)], dtype=object)
        if with_html
        else np.array([b""] * n_rows, dtype=object)
    )

    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(warc_ts),
            "html": html,
            "text": texts,
            "lang": lang,
            "window": np.where(is_test, "test", "control"),
        }
    )
    sidecar = pd.DataFrame(
        {
            "token": [p.token for p in planted],
            "test_count": [p.test_count for p in planted],
            "control_count": [p.control_count for p in planted],
        }
    )
    return pages, sidecar


def write_pages(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    partitions_per_window: int = 4,
    **kw,
) -> str:
    """Write the pages table as window-partitioned parquet + sidecar.

    The ``window=...`` directory layout is the parquet stand-in for
    Iceberg hidden partitioning on ``days(warc_ts)`` (SURVEY.md §7.2:
    no Iceberg runtime jar in this sandbox) — predicate
    ``window = 'test'`` prunes files, same as a ``warc_ts`` range would
    against Iceberg metadata.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages, sidecar = generate_pages(n_rows, seed=seed, **kw)
    table_dir = os.path.join(out_dir, "pages")
    os.makedirs(table_dir, exist_ok=True)
    for window, sub in pages.groupby("window"):
        wdir = os.path.join(table_dir, f"window={window}")
        os.makedirs(wdir, exist_ok=True)
        sub = sub.drop(columns=["window"]).reset_index(drop=True)
        tbl = pa.Table.from_pandas(
            sub,
            schema=pa.schema(
                [
                    ("url", pa.string()),
                    ("warc_ts", pa.timestamp("us")),
                    ("html", pa.binary()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                ]
            ),
            preserve_index=False,
        )
        n_parts = max(1, partitions_per_window)
        rows_per = -(-tbl.num_rows // n_parts)
        for i in range(n_parts):
            chunk = tbl.slice(i * rows_per, rows_per)
            if chunk.num_rows:
                pq.write_table(chunk, os.path.join(wdir, f"part-{i:04d}.parquet"))
    sidecar.to_parquet(os.path.join(out_dir, "sidecar.parquet"))
    return out_dir


def write_pages_spark(
    spark,
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    vocab: int = 50_000,
    avg_tokens: int = 275,
    partitions: int | None = None,
    with_html: bool = False,
) -> str:
    """Distributed deterministic pages generator for bench-scale tables.

    Each executor generates its id-range with an rng seeded by
    (seed, block) — fully deterministic independent of parallelism.
    No planted tokens (the pandas generator covers that for tests);
    organic Zipf text only, which is what throughput benchmarking needs.
    """
    import pyarrow as pa

    partitions = partitions or max(32, n_rows // 25_000)

    def gen(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                continue
            rng = np.random.default_rng((seed << 20) ^ int(ids[0]))
            n = len(ids)
            doc_len = 50 + (ids * 2654435761 % (2 * avg_tokens - 100 + 1))
            total = int(doc_len.sum())
            token_ids = rng.zipf(1.07, size=int(total * 1.3))
            token_ids = token_ids[token_ids <= vocab]
            while len(token_ids) < total:
                extra = rng.zipf(1.07, size=total)
                token_ids = np.concatenate([token_ids, extra[extra <= vocab]])
            token_strs = np.char.add("w", token_ids[:total].astype("U8"))
            texts = []
            off = 0
            for dl in doc_len:
                texts.append(" ".join(token_strs[off : off + int(dl)]))
                off += int(dl)
            urls = [f"https://host{int(i) % 997}.example.com/p/{int(i)}" for i in ids]
            is_test = ids % 2 == 1
            base = np.where(is_test, TEST_START, CONTROL_START)
            ts = base + (ids % WINDOW_DAYS) * np.timedelta64(86_400, "s")
            langs = LANGS[ids % len(LANGS)]
            yield pa.RecordBatch.from_pydict(
                {
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
                    "html": pa.array(
                        [wrap_html(u, t) for u, t in zip(urls, texts)] if with_html else [b""] * n,
                        pa.binary(),
                    ),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs.tolist(), pa.string()),
                    "window": pa.array(np.where(is_test, "test", "control").tolist(), pa.string()),
                }
            )

    df = spark.range(0, n_rows, 1, partitions).mapInArrow(
        gen,
        "url string, warc_ts timestamp, html binary, text string, lang string, window string",
    )
    df.write.mode("overwrite").partitionBy("window").parquet(os.path.join(out_dir, "pages"))
    return out_dir


def iceberg_available(spark) -> bool:
    """True iff an Iceberg runtime jar is on the session's classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def load_pages(spark, path: str, catalog: str = "parquet"):
    """Table adapter (SURVEY.md §7.2): ``--catalog parquet|iceberg``.

    catalog="parquet" (default): native partition discovery over
    ``<path>/pages/window=*`` gives the ``window`` partition column —
    predicates on it prune files at the scan, the parquet stand-in for
    Iceberg hidden partitioning on ``days(warc_ts)``.

    catalog="iceberg": ``spark.read.table(path)`` against an Iceberg
    catalog table identifier (e.g. ``cat.db.pages``) — requires the
    iceberg-spark-runtime jar on the classpath (not present in this
    sandbox; the dispatch raises a clear error rather than a
    ClassNotFound deep in the scan).  Partition pruning on ``warc_ts``
    then comes from Iceberg metadata instead of directory layout; every
    operator downstream is unchanged (they only see a DataFrame).
    """
    if catalog == "parquet":
        return spark.read.parquet(os.path.join(path, "pages"))
    if catalog == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "catalog='iceberg' requires the iceberg-spark-runtime jar on "
                "the classpath (spark.jars.packages=org.apache.iceberg:"
                "iceberg-spark-runtime-...); falling back is explicit: pass "
                "catalog='parquet'"
            )
        return spark.read.table(path)
    raise ValueError(f"unknown catalog {catalog!r}: expected 'parquet' or 'iceberg'")


def write_pages_table(spark, df, path: str, catalog: str = "parquet") -> None:
    """Write side of the adapter: parquet dir layout or Iceberg
    ``writeTo`` with hidden partitioning on ``days(warc_ts)``."""
    if catalog == "parquet":
        df.write.mode("overwrite").partitionBy("window").parquet(
            os.path.join(path, "pages")
        )
        return
    if catalog == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "catalog='iceberg' requires the iceberg-spark-runtime jar on "
                "the classpath; pass catalog='parquet' for the directory layout"
            )
        from pyspark.sql import functions as F

        df.writeTo(path).partitionedBy(F.days("warc_ts")).createOrReplace()
        return
    raise ValueError(f"unknown catalog {catalog!r}: expected 'parquet' or 'iceberg'")
