"""Reusable column expressions and skew helpers."""
