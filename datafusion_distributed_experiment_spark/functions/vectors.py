"""Vector primitives over ``array<float>`` embedding columns.

Dot products fold sequentially over the array (``aggregate`` +
``zip_with``), entirely JVM-side — at 100 TB this is a map-side expression
with zero shuffle, unlike a pandas-UDF round trip. Cosine similarities are
emitted as ``floor(1e6 * cos)`` integers (ppm) so results are robust to
last-ULP float differences when compared across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order, like the oracle)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_ppm(a: Column, b: Column, norm_a: Column | None = None, norm_b: Column | None = None) -> Column:
    """floor(1e6 * cosine(a, b)) as BIGINT; pass precomputed norms to avoid
    recomputing them per candidate pair."""
    na = norm_a if norm_a is not None else norm(a)
    nb = norm_b if norm_b is not None else norm(b)
    return F.floor(F.lit(1e6) * dot(a, b) / (na * nb)).cast("long")


# DuckDB oracle spellings (same sequential fold; `{a}`/`{b}` are DOUBLE[]
# expressions, `{n}` the fixed dimensionality).
#
# PRECONDITION (round-12 review): every vector must actually have `{n}`
# elements. Spark's dot() folds over the ACTUAL array length (zip_with),
# while this spelling indexes exactly 1..n — a longer row silently
# truncates on DuckDB only, and a shorter row NULL-poisons the DuckDB
# fold while Spark returns a finite sum. The PQ fit guards the corpus
# dimensionality loudly (similarity._pq_fit); other vector consumers
# inherit the fixture contract (FIXTURES.md pins embeddings at DIM).
DUCK_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(range(1, {n} + 1), i -> ({a})[i] * ({b})[i])), (acc, x) -> acc + x)"
)
