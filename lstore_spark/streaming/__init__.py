"""streaming operators (see package docstring)."""
