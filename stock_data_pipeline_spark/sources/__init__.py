"""Sources: seed tables and per-key fetch (the reference's extract tier)."""
