"""Driver-contract surface checks (fast; the full DuckDB comparison is
tools/check_contract.py, run at sf0.01 before each commit that touches
queries)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {oracles - qs}"
    # the sketch-estimate / approximate-recall queries are the only ones
    # allowed to skip an oracle (ANN scale paths carry recall pytests;
    # minhash_near_dups gained a real oracle in round 2)
    allowed_rows_only = {
        "cmcu_estimates",
        "countsketch_estimates",  # unbiased estimates; 3*sqrt(F2/w) bound in pytest
        "hll_distinct_by_lang",
        "kll_price_quantiles",
        "tdigest_value_quantiles",
        "bloom_membership",
        "simhash",
        "simhash_near_dups",
        "ivf_topk",
        "ivf_topk_indexed",  # == ivf_topk by pytest; stored-index layout
        "lsh_topk",
        "streaming_cmcu_snapshot",  # sketch estimates; fold==batch by pytest
        "bpe_train_encode",  # iterative merge state; fast==naive ref by pytest
        "hll_lang_overlap",  # estimates; error bound asserted in pytest
    }
    assert qs - oracles == allowed_rows_only


def test_entry_smoke(spark, sf001):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"token", "freq", "control_count"}


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_at_sf0001(spark, sf001, name):
    df = entrymod.queries()[name](spark, sf001)
    # schema materializes and the query executes without error
    n = df.count()
    assert n >= 0
