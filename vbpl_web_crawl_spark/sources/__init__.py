"""Sources: parquet catalog, synthetic site graph, image corpus."""
