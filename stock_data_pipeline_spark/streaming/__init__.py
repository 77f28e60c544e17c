"""Structured Streaming jobs (Tier A cadence + Tier B17-B19 semantics)."""
