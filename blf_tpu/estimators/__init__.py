"""Batched estimation: recursive least squares and streaming filters."""
