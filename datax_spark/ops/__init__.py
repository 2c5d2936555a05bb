"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) — the large-scale data-curation surface layered on the
engine. All operators are DataFrame-native (Catalyst expressions or Arrow
batches); none use per-row Python."""
