"""Operator library: each module registers named, oracle-tested queries."""
