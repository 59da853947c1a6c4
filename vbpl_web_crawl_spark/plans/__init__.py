"""Query plans registered for the driver's correctness gate."""
