"""PySpark-native analytics engine with the dataflow capabilities of
``nbuesing/kafka-streams-repartition``, re-expressed Spark-first.

The reference is a Kafka Streams demo (enrich purchase orders against
dimension tables, maintain cumulative per-product stats, migrate state
across a repartition) — see ``SURVEY.md``.  This package expresses the
same semantics as declarative DataFrame plans that Catalyst can
optimize, plus the large-scale training-data operators (dedup,
similarity search, text analysis, multimodal plumbing) that a 100 TB
deployment of such an engine needs.

Layout
------
- ``session``    SparkSession factory tuned for scale (AQE, Arrow, RocksDB state)
- ``schemas``    StructTypes mirroring the reference domain model
- ``sources``    table loaders, latest-per-key ("KTable") readers, Kafka IO, fixtures
- ``operators``  batch operators: pickup-order enrichment, product stats,
                 restore/merge migration, dedup family, similarity search,
                 text analysis, multimodal plumbing, windowed aggregations
- ``streaming``  Structured Streaming wrappers (update-mode cumulative aggs,
                 availableNow test mode, stateful migration)
- ``functions``  shared column-expression helpers (hashing, shingles, vectors)
- ``plans``      explain/plan-assertion utilities used by tests
"""

__version__ = "0.1.0"
