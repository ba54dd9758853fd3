"""Dataflow operators: extraction branches, cascade, dedup, similarity, chunking."""
