"""Operator library: reference-parity timeseries ops plus the extension
surface (joins, dedup, similarity, text, multimodal) from SURVEY.md §2B."""
