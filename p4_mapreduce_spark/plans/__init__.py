"""Plan-level utilities: job API (reference compat) and explain helpers."""
