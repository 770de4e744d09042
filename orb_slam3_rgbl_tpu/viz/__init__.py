"""Visualization (offline, off the critical path)."""
