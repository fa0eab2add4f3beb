from twitter_followers_patterns_mapreduce_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_queries,
    all_oracles,
    register,
)
