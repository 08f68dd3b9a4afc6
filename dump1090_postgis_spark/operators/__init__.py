"""Relational + stateful operators (SURVEY.md §2)."""
