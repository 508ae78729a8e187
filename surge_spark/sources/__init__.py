"""Source/sink layer (SURVEY §2.1): Kafka wrappers (`kafka` — real
connector options, broker-gated), the file-backed topic-log double
(`filelog` — the same S5/S6/S1/S9/W7 contract, executable and tested
without a broker), and the parquet testdata loaders (surge_spark.io)."""
