"""Shim package mirroring ``dbldatagen.core.engine`` module paths."""
