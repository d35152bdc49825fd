"""Ray Data batch transforms (map_batches callables and actor classes)."""
