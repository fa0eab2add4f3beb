"""Python UDTF surface (SURVEY.md §2.8) — the table-function escape
hatch added in Spark 4 for one-row→many-rows semantics that are
awkward as expressions.

The reference has no UDF surface at all (plain Hadoop mappers); the
engine's policy is built-ins first (see ``operators/text.py`` — all
scan-side SQL), Arrow-batched Pandas UDFs second (``multimodal.py``),
and row-at-a-time UDTFs LAST — this module exists to cover the API
surface and to pin down that the slow path still gets exact oracle
parity.  ``doc_chunks`` computes a comparable explosion with pure SQL
``posexplode`` at ~10-100× this throughput; use that pattern in hot
paths.

Determinism contract with the DuckDB oracle: sentence index counts ALL
'.'-split parts (before the emptiness filter), and trimming strips
ASCII spaces only — both pinned so Python ``split``/``strip`` and SQL
``string_split``/``trim`` agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx: bigint, sentence: string")
class SplitSentences:
    """Explode a document into trimmed, non-empty '.'-sentences with
    their pre-filter ordinal."""

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        if text is None:
            return
        for i, part in enumerate(text.split(".")):
            s = part.strip(" ")
            if s:
                yield i, s


def doc_sentences(documents: DataFrame) -> DataFrame:
    """Per-document sentence rows via the Python UDTF, lateral-joined —
    (doc_id, sent_idx, sentence).

    The input view gets a per-call unique name (and is dropped once the
    query is analyzed), so concurrent callers on one SparkSession can
    never resolve against each other's documents."""
    import uuid

    spark = documents.sparkSession
    spark.udtf.register("split_sentences", SplitSentences)
    view = f"_udtf_docs_{uuid.uuid4().hex}"
    documents.select("doc_id", "text").createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""SELECT d.doc_id, s.sent_idx, s.sentence
FROM {view} d, LATERAL split_sentences(d.text) s"""
        )
    finally:
        # spark.sql analyzes eagerly; the returned plan no longer needs
        # the catalog entry
        spark.catalog.dropTempView(view)


DOC_SENTENCES_ORACLE = """SELECT doc_id,
       CAST(i AS BIGINT) AS sent_idx,
       trim(parts[i + 1]) AS sentence
FROM (
    SELECT doc_id, parts, unnest(generate_series(0, len(parts) - 1)) AS i
    FROM (SELECT doc_id, string_split(text, '.') AS parts FROM documents)
)
WHERE trim(parts[i + 1]) <> ''"""
