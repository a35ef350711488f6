"""Operators: DataFrame → DataFrame transforms covering SURVEY.md §2."""
