"""Layer-2 golden parity vs the compiled C++ reference (SURVEY.md §5.2).

Compiles /root/reference/src/{sketch,fasta,MappedFile}.cpp (plain g++,
verified in SURVEY), runs it on deterministic FASTA micro-fixtures, and
asserts our Python/numpy replication — including our CountMinCU update
rule with the reference's H3 hash family — produces the *identical*
heavy-hitter sets and frequencies.  Stronger than the (eps, delta)
bound the north_rule requires.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from sketch_spark.core.refparity import (
    ReferenceCMCU,
    decode_key,
    encode_key,
    glibc_rand_sequence,
    reference_seeds,
    run_reference_pipeline,
)

REF_SRC = "/root/reference/src"
BIN = "/tmp/ref_sketch_golden"


def _have_compiler() -> bool:
    return shutil.which("g++") is not None and os.path.exists(f"{REF_SRC}/sketch.cpp")


@pytest.fixture(scope="module")
def ref_binary():
    if not _have_compiler():
        pytest.skip("g++ or reference source unavailable")
    if not os.path.exists(BIN):
        subprocess.run(
            [
                "g++", "-O2", "-std=c++11", "-pthread",
                f"{REF_SRC}/sketch.cpp", f"{REF_SRC}/fasta.cpp", f"{REF_SRC}/MappedFile.cpp",
                "-o", BIN,
            ],
            check=True,
            capture_output=True,
        )
    return BIN


def make_fasta(path: str, seqs: list[str]) -> None:
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{s}\n")  # header holds no ACTG bytes


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    """Engineered so several k-mers cross thresholds and some are then
    eliminated by the control step."""
    rng = np.random.default_rng(99)
    bases = "ACTG"

    def rand_seq(n):
        return "".join(rng.choice(list(bases), size=n))

    hot = "ACTGA"  # planted heavy k-mer (and its 4-prefixes)
    hot2 = "GGTCA"
    test_seqs = [rand_seq(60) for _ in range(6)]
    test_seqs += [hot * 4, (hot + "T") * 3, hot2 * 5]
    ctrl_seqs = [rand_seq(60) for _ in range(4)]
    ctrl_seqs += [hot2 * 12]  # kills hot2 in the control step

    d = tmp_path_factory.mktemp("fasta")
    test_fa = str(d / "tiny_test.fa")
    ctrl_fa = str(d / "tiny_control.fa")
    make_fasta(test_fa, test_seqs)
    make_fasta(ctrl_fa, ctrl_seqs)
    return test_fa, ctrl_fa


def run_binary(binary, test_fa, ctrl_fa, min_len, max_len, thresholds):
    res = subprocess.run(
        [binary, test_fa, ctrl_fa, str(min_len), str(max_len)]
        + [str(t) for t in thresholds],
        capture_output=True,
        text=True,
        check=True,
    )
    out = {}
    for line in res.stdout.splitlines():
        kmer, freq = line.split()
        out.setdefault(len(kmer), {})[kmer] = int(freq)
    return out


def test_glibc_rand_replication():
    seq = glibc_rand_sequence(5)
    assert seq.tolist() == [1804289383, 846930886, 1681692777, 1714636915, 1957747793]


def test_seed_table_shape():
    seeds = reference_seeds(5)
    assert seeds.shape == (5, 4, 4)
    assert (seeds < (1 << 14)).all()


def test_encode_decode_roundtrip():
    sym = [0, 1, 2, 3, 1]
    assert decode_key(encode_key(sym), 5) == "ACTGC"


@pytest.mark.parametrize(
    "min_len,max_len,thresholds",
    [(4, 5, [2, 2]), (4, 6, [3, 2, 2]), (5, 5, [2])],
)
def test_golden_parity(ref_binary, fixtures, min_len, max_len, thresholds):
    test_fa, ctrl_fa = fixtures
    expected = run_binary(ref_binary, test_fa, ctrl_fa, min_len, max_len, thresholds)
    got = run_reference_pipeline(
        open(test_fa, "rb").read(),
        open(ctrl_fa, "rb").read(),
        min_len,
        max_len,
        thresholds,
    )
    got_nonempty = {k: v for k, v in got.items() if v}
    assert got_nonempty == expected, (
        f"parity mismatch: ours={got_nonempty} reference={expected}"
    )
    # the fixture engineering worked: something was reported, and the
    # control step eliminated hot2
    total = sum(len(v) for v in expected.values())
    assert total > 0


def test_golden_parity_nontrivial(ref_binary, fixtures):
    """The planted k-mers behave as engineered (threshold crossing +
    control elimination), so the parity above is not vacuous."""
    test_fa, ctrl_fa = fixtures
    expected = run_binary(ref_binary, test_fa, ctrl_fa, 4, 5, [2, 2])
    flat = {k for by_len in expected.values() for k in by_len}
    assert "ACTGA" in flat  # planted survivor
    assert "GGTCA" not in flat  # killed by control
