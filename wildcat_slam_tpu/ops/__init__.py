"""Compute primitives: Lie-group math, splines, batched small eigendecompositions."""
