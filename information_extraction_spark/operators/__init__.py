"""DataFrame→DataFrame stage operators (SURVEY.md §2 inventory)."""
