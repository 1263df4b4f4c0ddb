"""Column-level function library: portable hashing/fingerprints, text
analysis, dedup, similarity, multimodal plumbing."""
