"""Engine operators: frontier/seen-set/politeness (the crawl core),
plus the training-data-pipeline operator families (dedup, similarity,
text analysis, multimodal plumbing)."""
