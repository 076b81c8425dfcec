"""pulsar_beam_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kafkaesque-io/pulsar-beam (reference at
/root/reference, Go), re-expressed Spark-first.

Layout
------
- ``session``    SparkSession factory tuned for local[32] testing and
                 documented for 1000-executor scale.
- ``sources``    batch parquet table registry + file-based streaming sources
                 (the stand-in for a Pulsar topic, SURVEY.md §1.1).
- ``operators``  relational + LLM-pipeline operators (SURVEY.md §2.2):
                 as-of join, dedup (exact/MinHash/SimHash/Jaccard/embedding),
                 similarity search, text analysis, multimodal plumbing.
- ``functions``  scalar-function surface helpers (cosine, shingles, hashes).
- ``plans``      plan-inspection utilities (pushdown/broadcast assertions).
- ``streaming``  Structured Streaming parity with the reference gateway:
                 ingest (G1), windows (S2-S5), bounded poll (G5), webhook
                 fan-out delivery with retry+reply (G2/G3), reconciler (G9).
- ``model``      Message/TopicConfig schemas, SHA-1 keying, validation and
                 changelog->snapshot materialization (G7/G8/G10).
- ``queries``    the declared query registry consumed by __spark_entry__.py;
                 every entry carries a DuckDB oracle SQL string when the
                 semantics are ANSI-SQL-expressible.
"""

__version__ = "0.1.0"
