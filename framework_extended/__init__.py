"""Compatibility layer: the reference's ``framework_extended`` import path."""
