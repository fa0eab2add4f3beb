from twitter_followers_patterns_mapreduce_spark.sources.readers import (  # noqa: F401
    EDGE_SCHEMA,
    EDGES_ORACLE_CTE,
    derived_edges,
    edges_from_csv,
    edges_from_lines,
    load_table,
)
