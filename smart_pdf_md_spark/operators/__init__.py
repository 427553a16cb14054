"""Operators: routing, extraction, linking, canonicalization, dedup, ANN, text stats."""
