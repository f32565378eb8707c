"""Operator library — composable DataFrame transforms grouped by
category. Each operator documents the SURVEY.md §2 row(s) it covers or
the training-data-pipeline extension it implements."""
