"""Reusable column-expression builders shared by operators and oracles."""
