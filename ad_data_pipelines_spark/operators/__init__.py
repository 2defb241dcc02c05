"""Composite DataFrame operators (journeys, aggregation patterns, dedup,
similarity, text stats)."""
