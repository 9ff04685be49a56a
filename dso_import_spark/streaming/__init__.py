"""Structured Streaming surface of the engine."""
