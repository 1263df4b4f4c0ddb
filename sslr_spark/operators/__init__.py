"""Sync-engine operators: full copy, incremental update, delete diff,
key-range utilities."""
