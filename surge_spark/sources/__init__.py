"""Source/sink layer (SURVEY §2.1): Kafka wrappers and the parquet testdata
loaders (the latter live in surge_spark.io)."""
