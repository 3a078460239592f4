"""CLI surface compatible with the reference scripts (param.py flag names)."""
