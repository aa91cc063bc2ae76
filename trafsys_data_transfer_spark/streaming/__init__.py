"""Placeholder — streaming variant lands later."""
