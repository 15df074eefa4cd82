"""Shared utilities: profiling hooks, roofline accounting."""
