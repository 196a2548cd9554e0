"""Dataflow operators (SURVEY.md §2): dedup/state, joins, aggregates,
sampling, text analysis, near-duplicate detection, similarity search,
multimodal plumbing. Library functions here; correctness queries over the
driver testdata live in ``plans/``.
"""
