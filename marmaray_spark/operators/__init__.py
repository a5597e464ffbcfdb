"""Dataflow + relational operators (fork/error-channel, dedup, upsert,
similarity, text analysis, multimodal)."""
