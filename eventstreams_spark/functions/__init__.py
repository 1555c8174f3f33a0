"""Column-level helper functions (pure plan builders, JVM-side exprs)."""
