"""Operator library: event-sourcing folds, dedup, similarity search, text
analytics, multimodal plumbing. Each module exposes composable DataFrame
builders; the query catalog (surge_spark.queries) wraps them into named,
oracle-checked entries."""
