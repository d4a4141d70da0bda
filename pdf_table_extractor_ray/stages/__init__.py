"""Ray Data stages: detection, extraction strategies, dedup, text stats,
similarity, multimodal plumbing."""
