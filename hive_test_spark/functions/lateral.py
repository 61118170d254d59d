"""stub — filled in by milestone (SURVEY.md §7.3)."""
