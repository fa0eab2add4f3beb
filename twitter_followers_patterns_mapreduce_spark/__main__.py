from twitter_followers_patterns_mapreduce_spark.cli import main

raise SystemExit(main())
