"""Operator library: the reference's top-N plus the extended surface."""
