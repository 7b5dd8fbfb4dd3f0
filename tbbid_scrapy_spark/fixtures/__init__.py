"""Deterministic fixtures: synthetic site graph + the single-threaded
reference-skeleton crawl simulator (ordering / seen-set oracle)."""
