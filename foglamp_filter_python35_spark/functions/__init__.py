"""Extension operator library: text analysis, dedup, similarity, multimodal."""
