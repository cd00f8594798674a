"""Workload models (L3/L4)."""
