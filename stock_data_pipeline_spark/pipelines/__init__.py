"""Parameterized ingestion pipelines (the reference's four DAGs, unified)."""
