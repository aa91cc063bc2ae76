"""Engine operators: MERGE upsert, rollups, dedup, similarity, text, multimodal."""
