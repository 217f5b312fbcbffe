"""Engine operators: detection, word-score, dedup, similarity, text stats."""
