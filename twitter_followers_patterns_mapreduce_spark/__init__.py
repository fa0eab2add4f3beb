"""PySpark-native analytics engine with the query capabilities of the
reference Hadoop/MapReduce project
``shrivastavasatyam/Twitter-Followers-Patterns-MapReduce``.

The reference implements five graph-pattern jobs over a directed-edge
table (``README.md:71-87`` in the reference): filtered edge count,
exact/approximate 2-hop path counting, and shuffle/broadcast-join
triangle counting.  This engine re-expresses those semantics — plus a
large-scale training-data-pipeline extension surface (dedup,
similarity search, text analysis, windowed events, streaming) — as
declarative Spark DataFrame plans optimized by Catalyst/AQE.

Nothing here is a port: the reference's hand-rolled tagged-shuffle
machinery (IN/OUT value tags, token-count record discrimination,
filesystem job chaining) is subsumed by ``join``/``groupBy`` and a
single lazy DAG.  See SURVEY.md §1.2 / §3 for the mapping.
"""

__version__ = "0.1.0"

from twitter_followers_patterns_mapreduce_spark.session import get_spark  # noqa: F401
