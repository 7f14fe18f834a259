"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-documents generator with real partition
planning — the S-family surface for sources that aren't files at all
(feeds, fakes, APIs). Every field is a pure function of doc_id via md5,
so a DuckDB generate_series + the same md5 arithmetic reproduces the
output exactly regardless of how rows are split across partitions.

Scale posture: `partitions()` returns n_partitions independent splits;
each executor generates only its own id range (no driver materialization,
no shuffle) — the same contract a JDBC/warehouse connector fulfills.
"""

from __future__ import annotations

LANGS = ("en", "de", "fr", "es")


def make_synthetic_docs_source():
    """Return the DataSource class (built lazily so the pyspark import
    and the class shipping both happen inside the calling session).

    The classes are defined in function scope ON PURPOSE: cloudpickle
    then serializes them by value, so python workers never need this
    repo on their import path.
    """
    import hashlib

    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    def gen_row(doc_id: int):
        h = hashlib.md5(f"doc:{doc_id}".encode()).hexdigest()
        lang = LANGS[(int(h[0], 16)) % len(LANGS)]
        n_tokens = int(h[:6], 16) % 1000
        return (doc_id, lang, n_tokens, h)

    class SyntheticDocsReader(DataSourceReader):
        def __init__(self, options):
            self.n_rows = int(options.get("n_rows", 1000))
            self.n_parts = int(options.get("n_partitions", 8))

        def partitions(self):
            # contiguous id ranges; the LAST partition absorbs the tail
            per = max(1, self.n_rows // self.n_parts)
            starts = list(range(0, self.n_rows, per))[: self.n_parts]
            return [
                InputPartition((s, self.n_rows if i == len(starts) - 1 else min(s + per, self.n_rows)))
                for i, s in enumerate(starts)
            ]

        def read(self, partition):
            lo, hi = partition.value
            for doc_id in range(lo, hi):
                yield gen_row(doc_id)

    class SyntheticDocsSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_docs"

        def schema(self):
            return "doc_id bigint, lang string, n_tokens bigint, fingerprint string"

        def reader(self, schema):
            return SyntheticDocsReader(self.options)

    return SyntheticDocsSource


def make_synthetic_docs_stream_source():
    """Streaming twin of the synthetic source via
    SimpleDataSourceStreamReader (driver-side pull reader with offset
    tracking: initialOffset / read / readBetweenOffsets / commit).

    The reader is BOUNDED: one read() returns the whole remaining id
    range (SimpleDataSourceStreamReader prefetches on the driver and an
    AvailableNow drain processes exactly the prefetched batch — rows
    must be a materialized list, generators aren't picklable into the
    plan). readBetweenOffsets replays any committed range exactly, the
    contract checkpoint recovery depends on. Row content is the same
    pure md5 function as the batch source, so the same DuckDB
    generate_series oracle applies.
    """
    import hashlib

    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    def gen_rows(lo: int, hi: int):
        out = []
        for doc_id in range(lo, hi):
            h = hashlib.md5(f"doc:{doc_id}".encode()).hexdigest()
            out.append(
                (doc_id, LANGS[int(h[0], 16) % len(LANGS)], int(h[:6], 16) % 1000, h)
            )
        return out

    class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.n_rows = int(options.get("n_rows", 1000))

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            lo = start["pos"]
            return gen_rows(lo, self.n_rows), {"pos": self.n_rows}

        def readBetweenOffsets(self, start, end):
            return gen_rows(start["pos"], end["pos"])

        def commit(self, end):
            pass

    class SyntheticDocsStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_docs_stream"

        def schema(self):
            return "doc_id bigint, lang string, n_tokens bigint, fingerprint string"

        def simpleStreamReader(self, schema):
            return SyntheticDocsStreamReader(self.options)

    return SyntheticDocsStreamSource
