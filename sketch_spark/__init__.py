"""sketch_spark — a PySpark-native distributed sketch / approximate
aggregation library, built from scratch around the mergeable-sketch idea
of the reference (HansLehnert/sketch: Count-Min with conservative
update over streamed tokens), generalized per BASELINE.json north_rule:

* ``sketch_spark.core`` — Spark-free numpy sketch states
  (CountMin, CountMinCU, HyperLogLog, KLL, BloomFilter).
* ``sketch_spark.operators`` — DataFrame-level operators: Arrow-batched
  partial sketch aggregation + salted tree merge, emerging heavy
  hitters, dedup family, similarity search, checkpoint/resume.
* ``sketch_spark.sources`` — deterministic synthetic Common-Crawl-style
  pages table (Iceberg-shaped; parquet adapter in this sandbox).
* ``sketch_spark.functions`` — text analysis & multimodal column
  helpers (JVM-side expressions preferred; Arrow UDFs otherwise).
* ``sketch_spark.plans`` — plan inspection helpers (pushdown /
  broadcast / codegen assertions used by tests).
* ``sketch_spark.streaming`` — Structured Streaming sketch maintenance.
"""

__version__ = "0.1.0"
