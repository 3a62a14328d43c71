"""Utilities: FLOPs accounting, config parsing, torch weight import."""
