"""Training-data pipeline operators: dedup, similarity search, text stats,
multimodal plumbing. All Spark-first — built-in JVM expressions where
possible, Arrow-batched pandas UDFs where not, zero per-row Python."""
