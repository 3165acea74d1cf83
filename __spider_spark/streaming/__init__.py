"""Structured Streaming forms of the engine's micro-batch semantics."""
