"""Cross-cutting utilities: metering, profiling, logging."""
