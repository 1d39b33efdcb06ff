"""Compatibility layer: the reference's ``util`` import path."""
