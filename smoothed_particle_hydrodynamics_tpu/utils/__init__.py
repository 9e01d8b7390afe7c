"""Runtime utilities: diagnostics/observability, checkpointing, rendering,
profiling."""
