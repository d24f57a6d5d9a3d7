"""Heavy-hitter skew-balance measurement (VERDICT r3 next-round #7).

The north-star clause "explicit salting/repartitioning to defuse
heavy-hitter URL/host skew" has the salting code
(``keyed_sketch_aggregate``) and a correctness oracle, but until this
script no *measured-imbalance* evidence.  Protocol:

1. Generate a deterministic pages table and assign a 100x-skewed host
   key: one mega-host holds ~half the corpus, the rest spread over
   ``--n-hosts`` hosts (so mega has ~``n_hosts``x the median host's rows).
2. Shuffle it two ways at the same partition count and record the
   post-exchange per-task row histogram via ``partition_histogram``:
     a. naive ``repartition(P, host)`` — what a plain groupBy would do;
     b. the library's salted spread (``salted_spread``, the exact
        exchange ``keyed_sketch_aggregate`` executes).
3. Run the full keyed sketch aggregation both ways and confirm the
   merged per-host states are byte-identical (the salt only changes the
   partitioning, never the math), recording both walls.

Balance factor = max/median task rows.  Appends a row to BENCH.md and
writes bench_util/skew_last.json for bench.py to embed.

Usage: python bench_util/skew.py [--rows 200000] [--salt 8]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def skewed_pages(spark, rows: int, n_hosts: int):
    """Deterministic skewed corpus: a doc goes to the mega-host when
    ``xxhash64(url) % 2 == 0`` — approximately half the corpus by
    content-hash parity (Spark's signed ``%`` sends negative odd hashes
    to -1, so slightly over half lands on mega) — else to
    ``host-(xxhash64(url) mod n_hosts)``.  Same input rows -> same
    split on every run."""
    from sketch_spark.sources.pages import write_pages_spark

    table = f"/tmp/sketch_spark_skew_pages_{rows}"
    marker = os.path.join(table, f".generated_{rows}")
    if not os.path.exists(marker):
        write_pages_spark(spark, table, rows, seed=7)
        open(marker, "w").write("ok")
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(table, "pages"))
    return df.withColumn(
        "host",
        F.when(
            F.xxhash64("url") % 2 == 0, F.lit("mega.example.com")
        ).otherwise(F.concat(F.lit("host-"), (F.pmod(F.xxhash64("url"), F.lit(n_hosts))).cast("string"))),
    )


def balance(hist: dict[int, int]) -> dict:
    sizes = sorted(hist.values())
    med = statistics.median(sizes) if sizes else 0
    return {
        "tasks": len(sizes),
        "max": max(sizes) if sizes else 0,
        "median": med,
        # None, never float('inf'): the value flows into skew_last.json
        # and then bench.py's one-line JSON, and Infinity is not RFC-8259
        "factor": round(max(sizes) / med, 2) if med else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--n-hosts", type=int, default=100)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH.md"))
    args = ap.parse_args()

    from sketch_spark.operators.aggregate import (
        SketchSpec,
        keyed_sketch_aggregate,
        partition_histogram,
        salted_spread,
    )
    from sketch_spark.session import get_spark

    spark = get_spark("skew-bench", cores=16, shuffle_partitions=args.partitions)
    df = skewed_pages(spark, args.rows, args.n_hosts).select("host", "url", "text")
    df.count()  # warm page cache

    naive = partition_histogram(
        df.repartition(args.partitions, "host"), expected_partitions=args.partitions
    )
    salted = partition_histogram(
        salted_spread(df, ["host"], ["text"], salt=args.salt,
                      partitions=args.partitions, row_id_col="url"),
        expected_partitions=args.partitions,
    )

    # exactly-mergeable kinds only: byte-identity across partitionings
    # holds for CM/HLL (not CMCU, whose conservative update is
    # grouping-dependent by construction — see tests/test_skew.py)
    specs = [
        SketchSpec("cm", "cm", "text", mode="tokens",
                   params={"depth": 4, "log2_width": 14, "seed": 1}),
        SketchSpec("hll", "hll", "text", mode="tokens", params={"p": 12}),
    ]

    def run(salt: int) -> tuple[float, bytes]:
        t0 = time.perf_counter()
        out = keyed_sketch_aggregate(
            df, ["host"], specs, salt=salt, partitions=args.partitions, row_id_col="url"
        )
        rows = sorted(
            (r["host"], r["spec"], bytes(r["state"])) for r in out.collect()
        )
        wall = time.perf_counter() - t0
        import hashlib

        digest = hashlib.md5(b"".join(h.encode() + s.encode() + st for h, s, st in rows)).hexdigest()
        return round(wall, 2), digest

    wall_salted, dig_salted = run(args.salt)
    wall_unsalted, dig_unsalted = run(1)
    assert dig_salted == dig_unsalted, "salting changed the merged states!"

    out = {
        "metric": "skew_balance_factor",
        "rows": args.rows,
        "n_hosts": args.n_hosts,
        "salt": args.salt,
        "partitions": args.partitions,
        "naive": balance(naive),
        "salted": balance(salted),
        "wall_salted_sec": wall_salted,
        "wall_unsalted_sec": wall_unsalted,
        "states_identical": True,
        "value": balance(salted)["factor"],
    }
    print(json.dumps(out))
    out["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(os.path.join(REPO, "bench_util", "skew_last.json"), "w") as f:
        json.dump(out, f, indent=1)

    if os.path.exists(args.out):
        stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
        with open(args.out, "a") as f:
            f.write(
                f"\nSkew balance ({stamp}): {args.rows} docs, mega-host ~50% of corpus "
                f"(~{args.n_hosts}x median), P={args.partitions}: naive repartition(host) "
                f"max/median = {out['naive']['factor']} vs salted (S={args.salt}) "
                f"= {out['salted']['factor']}; keyed aggregate wall "
                f"{wall_unsalted}s unsalted -> {wall_salted}s salted, merged states byte-identical.\n"
            )
    spark.stop()


if __name__ == "__main__":
    main()
