"""Column-level function library (pure Spark SQL expressions, JVM-side)."""
