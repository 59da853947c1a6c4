"""Structured Streaming layer: incremental rounds + windowed aggs."""
