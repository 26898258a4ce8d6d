"""Host-side utilities: profiling, validation, observability (SURVEY.md §5)."""
