"""Shared column-expression helpers (all built-in-function compositions)."""
