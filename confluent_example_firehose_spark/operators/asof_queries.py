"""Populated below."""
