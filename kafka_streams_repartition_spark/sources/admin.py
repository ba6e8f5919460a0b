"""Topic admin (S9): create/delete/describe "topics" with partition
counts and compaction configs.

The reference's ``BuildSystem.java:67-131`` administers Kafka topics
before any app runs: create with a partition count (``:110-120``),
delete (``:96-108``), and per-topic configs — compaction for the
dimension topics (``:43-50``). In a Spark-native engine the durable
analog of a topic is a managed dataset directory: a parquet dataset
plus a JSON spec capturing the partition count (→ how writes are
physically split) and the compaction contract (→ reads reduce to
latest-per-key with tombstone deletes, exactly the KTable
materialization in :mod:`..sources.ktable`).

Scale notes: the partition count governs write-side file layout the
same way Kafka's governs broker partitions — readers of a 100 TB topic
get one task per file split regardless. Compacted reads cost one keyed
shuffle (the minimal latest-per-key plan); non-compacted reads are pure
scans.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .ktable import latest_per_key

SPEC_FILE = "_topic_spec.json"


@dataclass
class TopicSpec:
    """What ``BuildSystem`` passes to ``NewTopic``: name, partition
    count, and the compaction contract (key/order columns replace
    Kafka's implicit record key + offset order)."""

    name: str
    partitions: int = 4
    compacted: bool = False
    key_cols: list[str] = field(default_factory=list)
    order_cols: list[str] = field(default_factory=list)
    tombstone_col: str | None = None

    def __post_init__(self) -> None:
        if self.partitions < 1:
            raise ValueError(f"partitions must be >= 1, got {self.partitions}")
        if self.compacted and (not self.key_cols or not self.order_cols):
            raise ValueError("compacted topics need key_cols and order_cols")


class TopicAdmin:
    """Create/delete/describe/list topics under one base directory."""

    def __init__(self, spark: SparkSession, base_dir: str) -> None:
        self.spark = spark
        self.base_dir = os.path.abspath(base_dir)
        os.makedirs(self.base_dir, exist_ok=True)

    def _topic_dir(self, name: str) -> str:
        # refuse path traversal — a topic name is an identifier, not a path
        path = os.path.abspath(os.path.join(self.base_dir, name))
        if os.path.dirname(path) != self.base_dir or os.sep in name:
            raise ValueError(f"invalid topic name: {name!r}")
        return path

    def create_topic(self, spec: TopicSpec, exist_ok: bool = False) -> None:
        """``BuildSystem.java:110-120`` — NewTopic(name, partitions)."""
        d = self._topic_dir(spec.name)
        if os.path.exists(d):
            if not exist_ok:
                raise FileExistsError(f"topic exists: {spec.name}")
            return
        os.makedirs(d)
        with open(os.path.join(d, SPEC_FILE), "w") as f:
            json.dump(asdict(spec), f)

    def delete_topic(self, name: str, missing_ok: bool = False) -> None:
        """``BuildSystem.java:96-108`` — deleteTopics."""
        d = self._topic_dir(name)
        if not os.path.exists(d):
            if missing_ok:
                return
            raise FileNotFoundError(f"no such topic: {name}")
        shutil.rmtree(d)

    def topic_exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._topic_dir(name), SPEC_FILE))

    def describe_topic(self, name: str) -> TopicSpec:
        d = self._topic_dir(name)
        try:
            with open(os.path.join(d, SPEC_FILE)) as f:
                return TopicSpec(**json.load(f))
        except FileNotFoundError:
            raise FileNotFoundError(f"no such topic: {name}") from None

    def list_topics(self) -> list[str]:
        return sorted(
            n
            for n in os.listdir(self.base_dir)
            if os.path.isfile(os.path.join(self.base_dir, n, SPEC_FILE))
        )

    # --- produce / consume -------------------------------------------------

    def write(self, name: str, df: DataFrame) -> None:
        """Append a batch, split into exactly the topic's partition
        count (the write-side analog of producing across N partitions;
        key-hash placement is Spark's shuffle when the read re-keys)."""
        spec = self.describe_topic(name)
        df.repartition(spec.partitions).write.mode("append").parquet(
            os.path.join(self._topic_dir(name), "data")
        )

    def read(self, name: str) -> DataFrame:
        """Scan a topic; compacted topics reduce to latest-per-key with
        tombstone deletes — the KTable contract (S2/S3,
        ``Streams.java:107-115``)."""
        spec = self.describe_topic(name)
        df = self.spark.read.parquet(os.path.join(self._topic_dir(name), "data"))
        if not spec.compacted:
            return df
        return latest_per_key(
            df, spec.key_cols, spec.order_cols, tombstone_col=spec.tombstone_col
        )
