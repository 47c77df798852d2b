"""Host-side utilities: configuration, containers, telemetry, checkpointing."""
