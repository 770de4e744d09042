"""Utilities: serialization, profiling, logging."""
