"""Hashed naive-Bayes text classifier: corpus-scale train, map-only score.

The fastText-style quality/language classifier every training-data
pipeline runs (CCNet's LID gate, quality classifiers for crawl
filtering) reduced to its distributed essence: tokens are hashed into
``n_buckets`` (the hashing trick — no vocabulary state, collisions are
the regularizer), per-bucket class counts are ONE map-side-combined
aggregation over the corpus, and the learned weights are closed-form
log-odds — no iterative optimizer, so the whole train is a single
Spark job whose shuffle carries at most ``n_buckets`` rows per input
partition.

Scoring is map-only: the B-row weight table rides into the plan as an
array literal (B is 64-4096 — always driver-safe, same bounded-collect
contract as ``clustering.kmeans_fit``'s k x d centroid matrix), and
each doc's score is a per-row Catalyst fold over its token buckets.
Zero shuffles, zero Python, survives any corpus size.

Everything is md5-derived, so the full train+score pipeline is
reproducible in DuckDB for the value-hash oracle (``nb_classifier_sql``).
Reference analog: none — the reference has no supervised component;
this is part of the LLM-pipeline battery (SURVEY §2.2).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import tokens_col

__all__ = ["nb_train", "nb_score", "nb_classifier_sql"]


def _bucket(tok: Column, n_buckets: int, seed: int) -> Column:
    """Token -> bucket in [0, n_buckets): first 8 md5 hex digits of
    'seed:tok' mod B.  32 bits through a 64-bit long — exact, and
    bit-identical to the DuckDB mirror."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), tok)), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(n_buckets)).cast("int")


def nb_train(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    n_buckets: int = 64,
    alpha: float = 0.5,
    seed: int = 1,
) -> tuple[list[float], float]:
    """Train hashed multinomial naive Bayes on ``label`` (boolean
    Column) over ``text_col``.  Returns (weights, bias): weights[b] =
    log-odds of bucket b, bias = log prior odds.

    One pass: explode token buckets -> groupBy(bucket) with map-side
    combine (shuffle <= n_buckets rows/partition) -> collect the B-row
    count table (bounded by construction).  Weights and bias are
    FIXED-POINT integers in 1e-6 log-odds units: a doc score is then
    an INTEGER sum, which is exact and order-independent, so Spark's
    in-token-order fold and DuckDB's arbitrary-order SUM agree
    bit-for-bit at any scale (a double sum rounded to 6dp was observed
    to differ by 1 ulp-of-rounding on 1 of 5000 docs at sf0.1 —
    integer arithmetic removes the failure class, not the instance).
    """
    toks = df.select(
        label.cast("boolean").alias("_lab"), tokens_col(text_col).alias("_t")
    )
    exploded = toks.select("_lab", F.explode("_t").alias("_tok")).select(
        "_lab", _bucket(F.col("_tok"), n_buckets, seed).alias("_bkt")
    )
    counts = (
        exploded.groupBy("_bkt")
        .agg(
            F.sum(F.when(F.col("_lab"), 1).otherwise(0)).alias("pos"),
            F.sum(F.when(~F.col("_lab"), 1).otherwise(0)).alias("neg"),
        )
        .collect()
    )
    pos = {r["_bkt"]: r["pos"] for r in counts}
    neg = {r["_bkt"]: r["neg"] for r in counts}
    pos_tot = sum(pos.values())
    neg_tot = sum(neg.values())
    denom_p = pos_tot + alpha * n_buckets
    denom_n = neg_tot + alpha * n_buckets
    weights = [
        int(
            round(
                (
                    math.log((pos.get(b, 0) + alpha) / denom_p)
                    - math.log((neg.get(b, 0) + alpha) / denom_n)
                )
                * 1_000_000
            )
        )
        for b in range(n_buckets)
    ]
    docs = df.select(
        F.sum(label.cast("int")).alias("p"), F.sum((~label).cast("int")).alias("n")
    ).collect()[0]
    bias = int(round(math.log(docs["p"] / docs["n"]) * 1_000_000))
    return weights, bias


def nb_score(
    df: DataFrame,
    weights: list[int],
    bias: int,
    text_col: str = "text",
    seed: int = 1,
    score_col: str = "score",
    pred_col: str = "pred",
) -> DataFrame:
    """Map-only scoring: score = (bias + sum_t w[bucket(t)]) / 1e6 in
    exact integer arithmetic, pred = raw integer > 0.  The weight
    table is an array literal — no join, no shuffle, whole-stage
    codegen end to end."""
    n_buckets = len(weights)
    w_arr = F.array(*[F.lit(int(w)).cast("long") for w in weights])
    # stage the tokenize as its own projection: referencing it from
    # inside the fold lambda would re-evaluate it per element
    staged = df.withColumn("_t", tokens_col(text_col))
    staged = staged.withColumn(
        "_wts", F.transform(F.col("_t"), lambda t: w_arr[_bucket(t, n_buckets, seed)])
    )
    raw = F.lit(int(bias)).cast("long") + F.aggregate(
        "_wts", F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        staged.withColumn("_raw", raw)
        .withColumn(score_col, (F.col("_raw") / F.lit(1_000_000.0)))
        .withColumn(pred_col, (F.col("_raw") > 0).cast("int"))
        .drop("_t", "_wts", "_raw")
    )


def nb_classifier_sql(
    label_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    alpha: float = 0.5,
    seed: int = 1,
) -> str:
    """DuckDB mirror of nb_train + nb_score as one statement:
    identical md5 bucketing, identical fixed-point micro-log-odds
    weights, exact integer score sums.  ``label_sql`` is the boolean
    label expression (e.g. "lang = 'en'")."""
    return f"""
        WITH base AS (
          SELECT {id_col}, ({label_sql}) AS lab,
                 regexp_split_to_array(trim(text), '\\s+') AS t
          FROM {table}
        ), tok AS (
          SELECT {id_col}, lab,
                 CAST(CAST('0x' || substr(md5('{seed}:' || u.tok), 1, 8) AS UBIGINT)
                      % {n_buckets} AS INT) AS bkt
          FROM base, unnest(t) AS u(tok)
        ), counts AS (
          SELECT bkt,
                 sum(CASE WHEN lab THEN 1 ELSE 0 END) AS pos,
                 sum(CASE WHEN lab THEN 0 ELSE 1 END) AS neg
          FROM tok GROUP BY bkt
        ), tot AS (
          SELECT sum(pos) AS pt, sum(neg) AS nt FROM counts
        ), wts AS (
          SELECT g.b AS bkt,
                 CAST(round((ln((coalesce(c.pos, 0) + {alpha}) / (tot.pt + {alpha} * {n_buckets}))
                     - ln((coalesce(c.neg, 0) + {alpha}) / (tot.nt + {alpha} * {n_buckets})))
                     * 1000000) AS BIGINT) AS w
          FROM generate_series(0, {n_buckets} - 1) AS g(b)
          LEFT JOIN counts c ON c.bkt = g.b, tot
        ), prior AS (
          SELECT CAST(round(ln(CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS DOUBLE)
                        / sum(CASE WHEN lab THEN 0 ELSE 1 END)) * 1000000) AS BIGINT) AS bias
          FROM base
        ), scores AS (
          SELECT tok.{id_col}, prior.bias + sum(wts.w) AS raw
          FROM tok JOIN wts USING (bkt), prior
          GROUP BY tok.{id_col}, prior.bias
        )
        SELECT {id_col}, raw / 1000000.0 AS score,
               CAST(CASE WHEN raw > 0 THEN 1 ELSE 0 END AS INT) AS pred
        FROM scores
    """
