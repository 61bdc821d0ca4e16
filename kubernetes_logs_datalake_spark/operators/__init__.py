"""High-level distributed operators: deduplication families, similarity
search, time-bucket rollups, and multimodal column plumbing."""
