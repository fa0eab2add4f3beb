"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) —
a deterministic synthetic edge generator, the engine's "custom
connector" surface.

The reference's only source is a CSV on HDFS (``Makefile:10``,
``exact/Exact2HopCount.java:55-59``); this connector shows the
idiomatic Spark-4 way to plug a NON-file system into the same edge
abstraction: implement ``DataSource``/``DataSourceReader``, register
once per session, and every graph operator runs unchanged on
``spark.read.format("synthetic_edges")``.

Scale model: ``partitions()`` splits the node-id space into contiguous
ranges — each executor task generates ONLY its range (no driver
materialization, no shuffle on read), exactly how a real external
connector should expose parallelism.  Determinism: edge targets come
from a per-source splitmix64-style hash of (src, j), so any node range
regenerates identically on retry — the property Spark requires of a
re-executable partition read.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer — public-domain integer hash."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class SyntheticEdgesReader(DataSourceReader):
    def __init__(self, options):
        self.n_nodes = int(options.get("n_nodes", 1000))
        self.out_degree = int(options.get("out_degree", 4))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 42))
        if self.n_nodes < 1:
            # Spark rejects a partitionless read; fail with the real reason
            raise ValueError(f"n_nodes must be >= 1, got {self.n_nodes}")

    def partitions(self):
        step = max(1, (self.n_nodes + self.n_partitions - 1) // self.n_partitions)
        return [
            _RangePartition(lo, min(lo + step, self.n_nodes))
            for lo in range(0, self.n_nodes, step)
        ]

    def read(self, partition: _RangePartition):
        # NB per-node degree is an UPPER bound: each of the d draws is
        # independent, so any number of them can land on the source node
        # (dropped, not resampled — resampling would make
        # retry-determinism depend on collision history) and two draws
        # can emit the same (src, dst) pair.
        n, d, seed = self.n_nodes, self.out_degree, self.seed
        for src in range(partition.lo, partition.hi):
            for j in range(d):
                dst = _mix(seed * 0x100000001B3 + src * d + j) % n
                if dst != src:
                    yield (src, dst)


class SyntheticEdges(DataSource):
    """``spark.read.format("synthetic_edges")`` after
    ``spark.dataSource.register(SyntheticEdges)``.

    Options: n_nodes, out_degree, n_partitions, seed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_edges"

    def schema(self) -> str:
        return "src bigint, dst bigint"

    def reader(self, schema) -> SyntheticEdgesReader:
        return SyntheticEdgesReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEdges)


def expected_edges(n_nodes: int, out_degree: int, seed: int = 42) -> list[tuple[int, int]]:
    """Driver-side golden generator — same arithmetic, for tests."""
    out = []
    for src in range(n_nodes):
        for j in range(out_degree):
            dst = _mix(seed * 0x100000001B3 + src * out_degree + j) % n_nodes
            if dst != src:
                out.append((src, dst))
    return out


# ---------------------------------------------------------------------------
# Streaming form: the same deterministic generator as an UNBOUNDED source
# ---------------------------------------------------------------------------

class SyntheticEdgesStreamReader(SimpleDataSourceStreamReader):
    """``SimpleDataSourceStreamReader`` over the node-id space: each
    micro-batch advances a cursor by ``batch_nodes`` source nodes and
    emits exactly their edges.  The offset dict {"next": <node>} is the
    ENTIRE source state — Spark checkpoints it, and
    :meth:`readBetweenOffsets` regenerates any [start, end) slice
    bit-identically on replay (splitmix64 on (src, j), no RNG state),
    which is the exactly-once contract a replayable streaming
    connector must satisfy.  The source is bounded by ``n_nodes`` so
    availableNow drains it to a deterministic fixed point equal to the
    batch read with the same options."""

    def __init__(self, options):
        self.n_nodes = int(options.get("n_nodes", 1000))
        self.out_degree = int(options.get("out_degree", 4))
        self.batch_nodes = int(options.get("batch_nodes", 250))
        self.seed = int(options.get("seed", 42))
        if self.n_nodes < 1:
            raise ValueError(f"n_nodes must be >= 1, got {self.n_nodes}")

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _gen(self, lo: int, hi: int):
        n, d, seed = self.n_nodes, self.out_degree, self.seed
        for src in range(lo, hi):
            for j in range(d):
                dst = _mix(seed * 0x100000001B3 + src * d + j) % n
                if dst != src:
                    yield (src, dst)

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_nodes, self.n_nodes)
        # a LIST ITERATOR, not a generator and not a bare list: the
        # driver-side prefetch cache copy.copy()s the iterator (generators
        # fail to pickle) and calls next() on it for the empty-batch check
        return iter(list(self._gen(lo, hi))), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._gen(int(start["next"]), int(end["next"]))))


class SyntheticEdgesStream(DataSource):
    """``spark.readStream.format("synthetic_edges_stream")`` after
    ``spark.dataSource.register(SyntheticEdgesStream)``.

    Options: n_nodes, out_degree, batch_nodes, seed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_edges_stream"

    def schema(self) -> str:
        return "src bigint, dst bigint"

    def simpleStreamReader(self, schema) -> SyntheticEdgesStreamReader:
        return SyntheticEdgesStreamReader(self.options)


def register_synthetic_stream_source(spark) -> None:
    spark.dataSource.register(SyntheticEdgesStream)
