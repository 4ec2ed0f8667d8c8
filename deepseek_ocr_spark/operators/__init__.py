"""Relational operators — DataFrame re-expressions of the reference dataflow
plus the training-data-pipeline operator family (dedup, similarity, quality)."""
