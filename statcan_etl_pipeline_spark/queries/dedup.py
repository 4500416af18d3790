"""Filled in as SURVEY.md §2 coverage widens."""
