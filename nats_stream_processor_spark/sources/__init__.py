"""Custom data sources (Python DataSource API)."""
