"""Stub — filled in by a later milestone."""
