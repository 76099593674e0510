"""Registry query definitions, grouped by domain (see registry.py)."""
