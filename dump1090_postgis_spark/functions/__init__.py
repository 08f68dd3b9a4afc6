"""Scalar/columnar helper functions (SURVEY §2.2, §2.7)."""
