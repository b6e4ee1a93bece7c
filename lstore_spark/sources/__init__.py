"""sources operators (see package docstring)."""
