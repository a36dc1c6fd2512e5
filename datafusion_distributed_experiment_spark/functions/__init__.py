"""Reusable column-level functions (JVM-side, codegen-friendly).

Everything here is built from ``pyspark.sql.functions`` higher-order
functions — no Python UDFs in any hot path — so expressions stay inside
whole-stage codegen and scale linearly with executors. Hash functions are
deliberately reproducible cross-engine (plain integer arithmetic), so the
DuckDB oracle can recompute them exactly.
"""

from .text import poly_hash, shingles, tokens
from .vectors import cosine_ppm, dot, norm

__all__ = ["poly_hash", "shingles", "tokens", "dot", "norm", "cosine_ppm"]
