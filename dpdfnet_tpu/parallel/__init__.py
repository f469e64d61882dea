"""Multi-chip scale-out via jax.sharding (batch data-parallelism over ICI)."""
