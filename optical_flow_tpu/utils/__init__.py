"""Utilities: golden-file IO, timing, image loading."""
