"""map_batches-callable stages (stateless functions and actor classes)."""
