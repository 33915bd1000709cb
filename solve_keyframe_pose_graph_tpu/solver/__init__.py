"""Device-resident pose-graph solver: problem arrays, GN/LM engine,
streaming trigger loop."""
