"""Operational tooling: license verification, usage flushing, license service."""
