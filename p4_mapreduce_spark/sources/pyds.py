"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

``synthdocs``: a deterministic synthetic-document generator source —
the kind of connector you write when the corpus lives behind an API or
a proprietary store Spark has no built-in reader for. Demonstrates the
full batch-read contract:

- **schema()** declares the typed output up front (no inference);
- **partitions()** splits the read into independent input partitions —
  this is the scale contract: a 1000-executor cluster reads 1000+
  partitions concurrently, each self-describing (no driver-side row
  generation);
- **read(partition)** yields rows for ONE partition only, from pure
  deterministic arithmetic (md5 of seed:doc_id), so any partition can
  be retried/speculated without coordination and two reads of the same
  options are bit-identical.

The reference has no pluggable source layer (its input is a directory
of text files, reference manager/__main__.py partitions them
round-robin by task id); this is the Spark-native generalization:
sources declare partitions, the scheduler owns placement/retries.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_VOCAB = (
    "the data spark table scan join merge sort hash group window "
    "filter batch stream row value query part line order key small "
    "fast slow agg customer"
).split()


def _doc_text(seed: int, doc_id: int, n_words: int) -> str:
    words = []
    h = b""
    for i in range(n_words):
        if i % 16 == 0:  # one md5 yields 16 word choices
            h = hashlib.md5(f"{seed}:{doc_id}:{i // 16}".encode()).digest()
        words.append(_VOCAB[h[i % 16] % len(_VOCAB)])
    return " ".join(words)


class SynthDocsDataSource(DataSource):
    """spark.read.format("synthdocs").option("rows", N)
    .option("partitions", P).option("seed", S).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, source string, n_words int, text string"

    def reader(self, schema) -> "SynthDocsReader":
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "SynthDocsStreamReader":
        return SynthDocsStreamReader(self.options)


class SynthDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        # contiguous doc_id ranges; the LAST partition absorbs the
        # remainder so every doc_id in [0, rows) is emitted exactly once
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        per = self.rows // self.n_parts
        start = partition.value * per
        end = self.rows if partition.value == self.n_parts - 1 else start + per
        for doc_id in range(start, end):
            # word count varies deterministically per doc (24..55)
            n_words = 24 + (
                hashlib.md5(f"{self.seed}:{doc_id}:len".encode()).digest()[0]
                % 32
            )
            yield (
                doc_id,
                f"synth_{doc_id % 4}",
                n_words,
                _doc_text(self.seed, doc_id, n_words),
            )


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the synthdocs source (Spark 4
    SimpleDataSourceStreamReader): each micro-batch emits the next
    ``batchRows`` documents until ``maxRows``, tracked by a doc_id
    offset. The two contracts that make this exactly-once:

    - ``read(start)`` advances the offset and returns the rows for
      (start, next]; the engine checkpoints the offsets, NOT the data;
    - ``readBetweenOffsets(start, end)`` deterministically REPLAYS any
      committed range after a restart — trivial here because rows are
      pure arithmetic over doc_id (the same property that makes the
      batch reader speculation-safe).

    Rows are bit-identical to the batch reader's for the same seed, so
    tests pin stream-drain == batch-read equality.
    """

    def __init__(self, options) -> None:
        self.batch_rows = int(options.get("batchRows", 100))
        self.max_rows = int(options.get("maxRows", 400))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"doc_id": 0}

    def _rows(self, start: int, end: int):
        for doc_id in range(start, end):
            n_words = 24 + (
                hashlib.md5(f"{self.seed}:{doc_id}:len".encode()).digest()[0]
                % 32
            )
            yield (
                doc_id,
                f"synth_{doc_id % 4}",
                n_words,
                _doc_text(self.seed, doc_id, n_words),
            )

    def read(self, start: dict):
        s = start["doc_id"]
        e = min(s + self.batch_rows, self.max_rows)
        # lists, not generators: the engine prefetches simple-reader
        # rows driver-side and pickles them to executors
        return list(self._rows(s, e)), {"doc_id": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._rows(start["doc_id"], end["doc_id"]))


def register_synthdocs(spark) -> None:
    """Idempotent registration of the synthdocs format."""
    spark.dataSource.register(SynthDocsDataSource)
