"""Iterative crawl engine: frontier rounds, politeness, checkpoints."""
