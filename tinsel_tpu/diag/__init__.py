"""Diagnostics: BSDF sample/pdf visualization, profiling counters."""
