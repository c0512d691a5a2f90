"""Structured Streaming: incremental file ingestion (the Spark-native
replacement for the reference's cron + Glue-bookmark pattern) and
watermarked window aggregation."""
