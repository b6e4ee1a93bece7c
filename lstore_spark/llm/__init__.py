"""llm operators (see package docstring)."""
