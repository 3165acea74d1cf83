"""Vectorized scalar functions (pandas/Arrow UDFs + JVM builtins only)."""
