"""Small shared vectorized helpers (hashing, normalization)."""
