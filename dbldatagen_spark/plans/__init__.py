"""Plan layer: declarative spec models, validation, resolution, serialization."""
