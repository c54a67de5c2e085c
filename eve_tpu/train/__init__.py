"""Training runtime: optimizer, jitted steps, checkpointing, harness."""
