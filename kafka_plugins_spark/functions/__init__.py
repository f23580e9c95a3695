"""Scalar/decode function library (JVM-side expressions; UDFs only where unavoidable)."""
