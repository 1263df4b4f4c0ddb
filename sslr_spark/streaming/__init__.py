"""Structured Streaming runtime: continuous sync as a streaming query,
windowed event analytics with late-data handling."""
