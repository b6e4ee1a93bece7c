"""operators operators (see package docstring)."""
