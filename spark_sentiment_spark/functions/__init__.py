"""Scalar/text function layer: cleaning, stemming, tokenization, lexicons."""
