"""Input sources: parquet readers and the deterministic webpages derivations."""
