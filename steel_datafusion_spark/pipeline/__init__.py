"""Beyond-reference pipeline operators (dedup/similarity/text/multimodal)."""
