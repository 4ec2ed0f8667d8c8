"""Structured Streaming variant of the extraction pipeline."""
