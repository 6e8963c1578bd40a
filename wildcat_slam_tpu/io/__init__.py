"""Dataset readers, synthetic data generation, and trajectory export."""
