"""functions operators (see package docstring)."""
