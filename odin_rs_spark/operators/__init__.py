"""Operator library mirroring SURVEY.md §2 (filters, joins, windows,
aggregations, set ops) plus the beyond-reference training-data operators
(dedup, similarity, text, multimodal)."""
