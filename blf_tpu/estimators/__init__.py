"""Batched estimation: recursive least squares (sequential gain form and
parallel-in-time information form), momentum-based contact wrench observers,
and streaming filters."""
