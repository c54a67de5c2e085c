"""Utilities: torch checkpoint conversion, pretrained weights, visualization."""
