"""Operators package — CDC state ops + LLM-data-pipeline extensions."""
