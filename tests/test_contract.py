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
        "checkpoint_resume",  # kill/resume orchestration; byte-equality asserted in-query + test_checkpoint
        "fd_spectrum",  # FD singular values: merge-order-dependent within the published spectral bound (test_fd)
        "fd_spectrum_by_label",  # keyed FD: same declared-rows-only rationale, per-group Weyl pytest
        "embedding_outliers",  # FD subspace residuals: values merge-order-dependent; subspace properties pytest-pinned
    }
    assert qs - oracles == allowed_rows_only


def test_driver_window_is_lru():
    """The driver's CORRECTNESS capture keeps only the first ~50 entries of
    queries() (VERDICT r3 #2), so queries() must be ordered
    least-recently-driver-checked first (VERDICT r4 #1): never-checked
    queries lead, then ascending newest-CORRECTNESS-round, names breaking
    ties — every round the 50 stalest driver rows get re-verified."""
    last = entrymod._last_driver_checked()
    names = list(entrymod.queries())
    keys = [(last.get(n, -1), n) for n in names]
    out_of_order = [names[i] for i in range(1, len(keys)) if keys[i] < keys[i - 1]]
    assert not out_of_order, (
        "queries() is not in LRU (last-driver-checked round, name) order; "
        f"first offenders: {out_of_order[:5]}"
    )
    # never-driver-checked queries (if any) must all sit inside the window
    unchecked = [n for n in names if n not in last]
    window = set(names[:50])
    if len(unchecked) <= 50:
        missing = set(unchecked) - window
        assert not missing, f"never-driver-checked queries outside window: {missing}"


def test_bench_line_fits_driver_capture():
    """The driver records the last 2,000 chars of bench.py stdout; r3's
    2,657-char line was truncated into parsed:null.  Build a worst-case
    detail dict (real query names, max-width floats) and assert the
    compact line stays under the 1,900-char budget."""
    import bench

    detail = {
        "metric": "headline_query_wall_seconds",
        "value": 99999.999,
        "unit": "sec",
        "queries": {name: 99999.999 for name in bench.HEADLINE},
        "sf": "/root/testdata/sf0.1",
        "cpus": 32,
        "sketch_build": {"tokens_per_sec": 999999999.9},
        "cmcu_error_vs_bound": {"underestimates": 0, "violation_rate": 0.99999},
        "pipeline_total": 99999.999,
        "scaling_efficiency": {
            "value": 0.999,
            "value_clean": 0.999,
            "spread": [0.999, 99.999],
            "mode": "local-cluster-processes",
            "rows": 999999999,
            "measured_at": "2099-12-31T23:59:59Z",
            "pairs": {
                "4->16": {
                    "tokens_per_sec_4": 99999999999.9,
                    "tokens_per_sec_16": 99999999999.9,
                }
            },
        },
        "scaling_best": {
            "value": 0.999,
            "value_clean": 0.999,
            "measured_at": "2099-12-31T23:59:59Z",
        },
        "skew_balance": {
            "naive": {"factor": 99999.99},
            "salted": {"factor": 99999.99},
            "salt": 999,
        },
    }
    line = bench.compact_line(detail)
    assert len(line) < bench.MAX_LINE_CHARS
    parsed = __import__("json").loads(line)
    assert parsed["value"] == 99999.999
    assert len(parsed["queries"]) == len(bench.HEADLINE)


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
