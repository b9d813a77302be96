"""map_batches stage callables: stateless fns + actor-pool classes."""
