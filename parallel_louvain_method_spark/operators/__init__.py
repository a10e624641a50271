"""DataFrame-level operators over the canonical edge table."""
