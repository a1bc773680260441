"""Demonstration pipelines over the driver testdata tables — one entry per
operator family in SURVEY.md §2, each paired with a DuckDB oracle where
SQL-expressible (see __ray_entry__.py)."""
