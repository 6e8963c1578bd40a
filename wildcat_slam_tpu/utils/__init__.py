"""Diagnostics: histograms, residual reports, profiling, debug checks."""
