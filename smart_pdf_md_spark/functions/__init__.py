"""Column-expression helpers and the extraction-semantics layer."""
