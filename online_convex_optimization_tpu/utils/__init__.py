"""Utilities: stats sufficient statistics, profiling, native bindings."""
