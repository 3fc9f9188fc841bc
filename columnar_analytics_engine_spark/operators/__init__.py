"""Composite operators: dedup, similarity search, as-of/range joins, top-k."""
