"""Column-function library (Catalyst expressions; no Python UDFs)."""
