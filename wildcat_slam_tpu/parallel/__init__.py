"""Multi-chip execution: jax.sharding mesh utilities and batched windows."""
