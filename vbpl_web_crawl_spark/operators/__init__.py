"""Engine operators: seen-set sketches, dedup, similarity, sections."""
