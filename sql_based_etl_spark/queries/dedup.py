"""Placeholder — populated in a later phase."""

QUERIES = {}
ORACLES = {}
