"""Logical plans: the round-based crawl driver and its state transitions."""
