"""Structured Streaming incremental ingestion (AvailableNow micro-batches,
watermarks, stateful ops)."""
