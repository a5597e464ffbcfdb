"""Sinks: size-targeted file output, hoodie-style table writes, sorted/batched
dispersal output."""
