"""Sources/scans (SURVEY.md §2.1) and sinks (§2.2)."""
