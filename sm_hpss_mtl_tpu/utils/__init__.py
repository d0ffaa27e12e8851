"""Utilities: honest benchmarking over tunneled devices, CSV logging, misc."""
