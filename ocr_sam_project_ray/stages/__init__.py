"""map_batches-callable stages (stateless fns + actor-pool classes)."""
