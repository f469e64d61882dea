"""Compiled runtime: jitted enhancement engines and sharding helpers."""
