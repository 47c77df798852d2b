"""Batched estimation: recursive least squares, momentum-based contact
wrench observers, and streaming filters."""
