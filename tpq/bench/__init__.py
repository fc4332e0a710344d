"""L6 bench: runner, roofline accounting, reporting (SURVEY.md §2.4)."""
