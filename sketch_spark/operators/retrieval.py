"""Lexical retrieval over the documents table: BM25 scoring and a
capped inverted index.

Why this lives here: the task's similarity-search battery needs a
lexical baseline next to the embedding paths (cosine/IVF/LSH) — BM25
is the standard one, and both operators here are pure Catalyst, so the
driver's DuckDB value-hash gate covers them end to end.

Scale shapes:
* ``bm25_topk`` — for a FIXED small term set the whole thing is one
  scan + one 1-row stats broadcast + TakeOrderedAndProject: per-doc
  term frequencies are ``size(filter(tokens, = term))`` expressions
  (no explode, no shuffle), corpus stats (N, avgdl, per-term df) come
  from a single aggregate whose 1-row result is broadcast back, and
  the top-k is a per-partition local fold.  Nothing data-scale ever
  shuffles.  For ad-hoc open-vocabulary queries you'd probe the
  inverted index instead of rescanning.
* ``inverted_index`` — the one honest shuffle: distinct (token, doc)
  pairs to the token's reducer.  Posting lists are CAPPED (lowest ids
  first) so no single token materializes an unbounded array; at real
  scale postings shard further by (token, id-range) buckets and land
  partitioned by token prefix — the cap keeps the semantics testable
  without the unbounded collect_set.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

__all__ = ["bm25_topk", "inverted_index"]


def _tokens_expr(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 for a fixed bag of query terms.

    score(d) = sum_t idf_t * tf_td*(k1+1) / (tf_td + k1*(1-b+b*dl/avgdl)),
    idf_t = ln((N - df_t + 0.5)/(df_t + 0.5) + 1)   (Robertson/Lucene).

    Ties break toward the lowest id; score is rounded to 6 digits so
    the cross-engine comparison is stable (ln differs by <=1 ulp).
    """
    toks = _tokens_expr(text_col)

    def _eq(term: str):
        # NB: the unary signature matters — pyspark passes (element,
        # index) to 2-arg lambdas, so a `t=t` default would capture the
        # index column instead of the term
        return lambda x: x == F.lit(term)

    wide = docs.select(
        F.col(id_col),
        F.size(F.filter(toks, lambda x: x != F.lit(""))).alias("_dl"),
        *[
            F.size(F.filter(toks, _eq(t))).alias(f"_tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = wide.agg(
        F.count("*").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = wide.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5) + 1.0
        )
        tf = F.col(f"_tf_{i}").cast("double")
        norm = tf + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        score = score + idf * tf * (k1 + 1.0) / norm
    return (
        scored.select(
            F.col(id_col),
            F.col("_dl").cast("long").alias("dl"),
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_sql(
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for ``bm25_topk`` — same tokenization, same formula,
    same rounding and tie order."""
    tf_cols = ",\n                 ".join(
        f"len(list_filter(t, x -> x = '{t}')) AS tf_{i}" for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"ln((s.n - s.df_{i} + 0.5)/(s.df_{i} + 0.5) + 1.0)"
        f" * w.tf_{i} * ({k1} + 1.0)"
        f" / (w.tf_{i} + {k1} * (1.0 - {b} + {b} * w.dl / s.avgdl))"
        for i in range(len(terms))
    )
    return f"""
        WITH wide AS (
          SELECT {id_col},
                 len(list_filter(t, x -> x <> '')) AS dl,
                 {tf_cols}
          FROM (SELECT {id_col}, regexp_split_to_array(trim(text), '\\s+') AS t
                FROM {table})
        ), s AS (
          SELECT count(*) AS n, avg(dl) AS avgdl, {df_cols} FROM wide
        )
        SELECT w.{id_col}, CAST(w.dl AS BIGINT) AS dl,
               round({score}, 6) AS score
        FROM wide w CROSS JOIN s
        ORDER BY score DESC, w.{id_col} ASC
        LIMIT {k}
    """


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 64,
    min_df: int = 1,
) -> DataFrame:
    """(token, df, postings) — df over distinct documents, postings the
    ``max_postings`` LOWEST doc ids as a comma-joined string (stable,
    hashable, bounded).  One exchange of distinct (token, doc) pairs
    (array_distinct folds duplicates map-side so it carries a doc's
    vocabulary, not its token stream); a row_number over the token
    partition marks the keepers BEFORE aggregation, so no agg buffer
    ever holds more than ``max_postings`` ids — a head token's full
    posting list (every doc in the corpus) never materializes anywhere.
    The df count still sees every row.  The window and the groupBy
    share the token partitioning: one shuffle total."""
    from pyspark.sql import Window as W

    pairs = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_tokens_expr(text_col))).alias("token"),
    ).filter(F.col("token") != "")
    rn = F.row_number().over(W.partitionBy("token").orderBy(F.col(id_col).asc()))
    ranked = pairs.withColumn("_rn", rn)
    return (
        ranked.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.array_join(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("_rn") <= max_postings, F.col(id_col))
                    )
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def inverted_index_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    max_postings: int = 64,
    min_df: int = 1,
) -> str:
    """DuckDB oracle for ``inverted_index``."""
    return f"""
        WITH pairs AS (
          SELECT DISTINCT {id_col},
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
          FROM {table}
        )
        SELECT token, CAST(count(*) AS BIGINT) AS df,
               array_to_string((list_sort(list({id_col})))[1:{max_postings}], ',') AS postings
        FROM pairs WHERE token <> ''
        GROUP BY token HAVING count(*) >= {min_df}
    """
