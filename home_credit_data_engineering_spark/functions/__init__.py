"""Scalar / text / vector function library (SURVEY §2.9 + north-star)."""
