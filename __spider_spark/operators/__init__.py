"""Relational operators: URL-seen dedup, politeness, robots, dedup family,
similarity search, multimodal plumbing."""
