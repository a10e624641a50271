"""Pure-Python/numpy kernels and column-function helpers (no JVM needed)."""
