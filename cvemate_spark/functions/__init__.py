"""Scalar function library: scoring ladder, text analysis, portable hashes."""
