"""Graph state: store, worlds registry, loaders (JSON/g2o), synthetic
generators."""
