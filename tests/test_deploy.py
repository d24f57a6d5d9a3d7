"""Real-cluster profile validation (deploy.py) — no Spark session
needed: these pin the consistency checks that would otherwise burn a
cluster-day (dynamic allocation without a shuffle-file story, Iceberg
catalog without its jar, fleet-idling partition counts), and that the
CLI dry-run emits a complete spark-submit argv."""

import pytest

from sketch_spark.deploy import (
    CLUSTER_PROFILE,
    format_command,
    iceberg_conf,
    submit_command,
    validate_profile,
)


def test_default_profile_is_valid():
    assert validate_profile(dict(CLUSTER_PROFILE)) == []


def test_default_profile_with_iceberg_is_valid():
    conf = dict(CLUSTER_PROFILE)
    conf.update(iceberg_conf("lake", "s3://w/x"))
    assert validate_profile(conf) == []


@pytest.mark.parametrize(
    "breakage, needle",
    [
        ({"spark.dynamicAllocation.shuffleTracking.enabled": "false"}, "shuffle"),
        ({"spark.executor.cores": "64"}, "cores"),
        ({"spark.executor.memory": "2g"}, "GiB/slot"),
        ({"spark.executor.memoryOverhead": "256m"}, "memoryOverhead"),
        ({"spark.sql.shuffle.partitions": "64"}, "idle"),
        ({"spark.sql.execution.arrow.pyspark.enabled": "false"}, "Arrow"),
        ({"spark.sql.session.timeZone": "America/New_York"}, "UTC"),
        ({"spark.sql.adaptive.enabled": "false"}, "AQE"),
        (
            {"spark.dynamicAllocation.minExecutors": "50",
             "spark.dynamicAllocation.maxExecutors": "10",
             "spark.sql.shuffle.partitions": "4000"},
            "minExecutors",
        ),
    ],
)
def test_validator_flags_each_failure_mode(breakage, needle):
    conf = dict(CLUSTER_PROFILE)
    conf.update(breakage)
    problems = validate_profile(conf)
    assert any(needle in p for p in problems), problems


def test_iceberg_catalog_without_jar_is_flagged():
    conf = dict(CLUSTER_PROFILE)
    conf["spark.sql.catalog.lake"] = "org.apache.iceberg.spark.SparkCatalog"
    problems = validate_profile(conf)
    assert any("iceberg runtime" in p for p in problems), problems


def test_submit_command_contains_profile_and_job(tmp_path):
    zip_path = str(tmp_path / "pkg.zip")
    open(zip_path, "w").write("")
    cmd = submit_command(
        ["build", "--input", "/data/pages", "--out", "/data/states"],
        master="k8s://https://api:6443",
        py_files=zip_path,
    )
    assert cmd[0] == "spark-submit"
    assert "--py-files" in cmd and zip_path in cmd
    joined = " ".join(cmd)
    for k, v in CLUSTER_PROFILE.items():
        assert f"{k}={v}" in joined
    assert cmd[-5:] == ["build", "--input", "/data/pages", "--out", "/data/states"]
    # invalid override raises with every problem listed
    with pytest.raises(ValueError, match="Arrow"):
        submit_command(
            ["build"],
            extra_conf={"spark.sql.execution.arrow.pyspark.enabled": "false"},
            py_files=zip_path,
        )
    # the rendering is shell-safe and one conf per line
    text = format_command(cmd)
    assert "spark-submit" in text and "\\\n" in text


def test_cli_submit_dry_run(capsys, tmp_path, monkeypatch):
    import sketch_spark.deploy as deploy
    from sketch_spark.cli import main

    zip_path = str(tmp_path / "pkg.zip")
    open(zip_path, "w").write("")
    monkeypatch.setattr("sketch_spark.session.package_zip", lambda: zip_path)
    main(
        [
            "submit", "--dry-run", "--master", "yarn",
            "--iceberg-catalog", "lake",
            "build", "--input", "/data/pages", "--out", "/data/states",
        ]
    )
    out = capsys.readouterr().out
    assert "spark-submit" in out
    assert "spark.sql.catalog.lake=" in out
    assert "--input /data/pages" in out or "/data/pages" in out
