"""Real-cluster dress rehearsal (VERDICT r3 stretch #9): a vetted
spark-submit profile for a genuine multi-executor deployment, a
consistency validator, and a dry-run command builder — so the library's
first contact with a real cluster isn't improvised.

Everything in this repo is exercised on local[N]; the configs a 1000-
executor run needs (dynamic allocation, shuffle tracking / external
shuffle service, decommissioning, Iceberg catalog jars) can't be
*executed* here, but they CAN be validated for internal consistency and
emitted as the exact ``spark-submit`` argv.  ``sketch_spark submit
--dry-run ...`` prints that argv after validation; without ``--dry-run``
it exec()s spark-submit directly.

Profile rationale (sized for the 100 TB design point, override per
cluster):

- 4 cores / 24g per executor: python workers (mapInArrow stages) pair
  1:1 with task slots, so per-slot memory must cover JVM shuffle buffers
  AND a pandas/numpy worker (~1-2 GB on the token paths).  Fatter
  executors amortize the broadcast sketch seeds; >5 cores hits HDFS/S3
  client contention and GC pauses.
- dynamicAllocation + shuffleTracking: sketch partials are tiny (KB
  states), so losing an executor's shuffle files is cheap to recompute;
  shuffle tracking avoids requiring the external shuffle service on
  k8s.  On YARN with the service, flip to shuffle.service.enabled.
- shuffle.partitions=4000 ≈ 1000 executors x 4 slots: every reducer
  wave fills the cluster; AQE coalesces small stages back down.
- maxPartitionBytes=256m: 100 TB / 256 MB ≈ 400k scan tasks — large
  enough that task launch overhead is noise, small enough that a
  skewed/straggling split re-runs cheaply.
- decommission + shuffleBlocks migration: spot/preemptible fleets are
  the realistic 1000-executor substrate; migrating shuffle blocks on
  decommission keeps the tree-merge stages from re-running whole waves.
"""

from __future__ import annotations

import os
import re
import shlex

__all__ = [
    "CLUSTER_PROFILE",
    "iceberg_conf",
    "validate_profile",
    "submit_command",
]

CLUSTER_PROFILE: dict[str, str] = {
    # executor shape
    "spark.executor.cores": "4",
    "spark.executor.memory": "24g",
    "spark.executor.memoryOverhead": "4g",  # python workers live here
    # elasticity
    "spark.dynamicAllocation.enabled": "true",
    "spark.dynamicAllocation.shuffleTracking.enabled": "true",
    "spark.dynamicAllocation.minExecutors": "2",
    "spark.dynamicAllocation.maxExecutors": "1000",
    "spark.dynamicAllocation.executorIdleTimeout": "120s",
    "spark.decommission.enabled": "true",
    "spark.storage.decommission.enabled": "true",
    "spark.storage.decommission.shuffleBlocks.enabled": "true",
    # planner / shuffle sizing
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "4000",
    "spark.sql.files.maxPartitionBytes": "268435456",
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
    # python/Arrow path (the sketch kernels)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    # determinism
    "spark.sql.session.timeZone": "UTC",
    # fetch-failure resilience for long scans
    "spark.stage.maxConsecutiveAttempts": "8",
    "spark.shuffle.io.maxRetries": "6",
}


def iceberg_conf(
    catalog: str = "lake",
    warehouse: str = "s3://bucket/warehouse",
    runtime_package: str = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0",
) -> dict[str, str]:
    """Catalog confs pairing with sources/pages.py's Iceberg seam; the
    runtime jar rides ``spark.jars.packages`` so validate_profile can
    check the pairing."""
    return {
        "spark.jars.packages": runtime_package,
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "rest",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }


_SIZE_RE = re.compile(r"^(\d+)([kmgt]?)b?$", re.IGNORECASE)
_SIZE_MULT = {"": 1, "k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40}


def _size_bytes(v: str) -> int | None:
    m = _SIZE_RE.match(str(v).strip())
    if not m:
        return None
    return int(m.group(1)) * _SIZE_MULT[m.group(2).lower()]


def validate_profile(conf: dict[str, str]) -> list[str]:
    """Consistency checks a real cluster submission must pass; returns
    a list of problems (empty = valid).  These encode the failure modes
    that waste a cluster-day: dynamic allocation without a shuffle-file
    story, an Iceberg catalog without its runtime jar, partition counts
    that idle the fleet, and per-slot memory too thin for the python
    workers."""
    problems: list[str] = []
    get = lambda k, d=None: conf.get(k, d)

    if get("spark.dynamicAllocation.enabled") == "true":
        if (
            get("spark.dynamicAllocation.shuffleTracking.enabled") != "true"
            and get("spark.shuffle.service.enabled") != "true"
        ):
            problems.append(
                "dynamicAllocation without shuffleTracking OR the external "
                "shuffle service loses shuffle files on every scale-down"
            )
        lo = int(get("spark.dynamicAllocation.minExecutors", "0"))
        hi = int(get("spark.dynamicAllocation.maxExecutors", "1"))
        if lo > hi:
            problems.append(f"minExecutors {lo} > maxExecutors {hi}")

    cores = int(get("spark.executor.cores", "1"))
    if not 1 <= cores <= 8:
        problems.append(f"executor.cores={cores} outside the sane 1..8 band")
    mem = _size_bytes(get("spark.executor.memory", "1g"))
    overhead = _size_bytes(get("spark.executor.memoryOverhead", "0"))
    if mem is None:
        problems.append(f"unparseable spark.executor.memory={get('spark.executor.memory')!r}")
    elif cores < 1:
        pass  # per-slot math is meaningless; the cores problem above covers it
    else:
        if mem // cores < 2 * 2**30:
            problems.append(
                f"executor.memory gives {mem // cores / 2**30:.1f} GiB/slot; "
                "the Arrow token kernels want >= 2 GiB per task slot"
            )
        if overhead is not None and overhead < cores * 512 * 2**20:
            problems.append(
                "memoryOverhead thinner than 512 MiB per python worker "
                f"({cores} slots -> one worker each on mapInArrow stages)"
            )

    max_exec = int(get("spark.dynamicAllocation.maxExecutors", "0") or 0)
    shuffle_parts = int(get("spark.sql.shuffle.partitions", "200"))
    if max_exec and shuffle_parts < max_exec * cores:
        problems.append(
            f"shuffle.partitions={shuffle_parts} < maxExecutors x cores = "
            f"{max_exec * cores}: reducer waves idle most of the fleet"
        )

    catalogs = [k for k in conf if k.startswith("spark.sql.catalog.") and k.count(".") == 3]
    if catalogs:
        jars = (get("spark.jars.packages", "") or "") + (get("spark.jars", "") or "")
        if "iceberg" not in jars.lower():
            problems.append(
                f"catalog(s) {catalogs} configured but no iceberg runtime in "
                "spark.jars.packages/spark.jars — the session will fail at first read"
            )

    if get("spark.sql.execution.arrow.pyspark.enabled") != "true":
        problems.append("Arrow disabled: every mapInArrow/pandas stage falls back to pickle")
    if get("spark.sql.session.timeZone") != "UTC":
        problems.append("session timeZone must be UTC (windowed rollups are UTC-defined)")
    if get("spark.sql.adaptive.enabled") == "false":
        problems.append("AQE disabled: skew-join and partition coalescing safety nets lost")
    return problems


def submit_command(
    job_args: list[str],
    master: str = "yarn",
    deploy_mode: str = "client",
    iceberg: dict[str, str] | None = None,
    extra_conf: dict[str, str] | None = None,
    py_files: str | None = None,
) -> list[str]:
    """The exact ``spark-submit`` argv for a cluster run of
    ``scripts/run_job.py`` — profile + overrides validated first
    (raises ValueError listing every problem).  ``py_files`` defaults
    to the freshly built package zip."""
    conf = dict(CLUSTER_PROFILE)
    if iceberg:
        conf.update(iceberg)
    if extra_conf:
        conf.update(extra_conf)
    problems = validate_profile(conf)
    if problems:
        raise ValueError("invalid cluster profile:\n- " + "\n- ".join(problems))
    if py_files is None:
        from .session import package_zip

        py_files = package_zip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = ["spark-submit", "--master", master, "--deploy-mode", deploy_mode]
    for k in sorted(conf):
        cmd += ["--conf", f"{k}={conf[k]}"]
    cmd += ["--py-files", py_files, os.path.join(repo, "scripts", "run_job.py")]
    cmd += list(job_args)
    return cmd


def format_command(cmd: list[str]) -> str:
    """Human-readable multi-line rendering of a submit argv."""
    out, i = [], 0
    while i < len(cmd):
        if cmd[i] in ("--conf", "--master", "--deploy-mode", "--py-files") and i + 1 < len(cmd):
            out.append(f"  {cmd[i]} {shlex.quote(cmd[i + 1])}")
            i += 2
        else:
            out.append(f"  {shlex.quote(cmd[i])}")
            i += 1
    return " \\\n".join(out).lstrip()
