"""Spark DataFrame operators (Arrow-batched)."""
