"""Operator-level helpers that aren't plain DataFrame compositions:
TRANSFORM script piping, table statistics, and write-path utilities."""
