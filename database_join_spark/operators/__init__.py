"""Reusable LLM-data-pipeline operators (dedup, similarity, text,
multimodal). Queries in ``database_join_spark.queries.pipeline`` are
thin wrappers over these."""
