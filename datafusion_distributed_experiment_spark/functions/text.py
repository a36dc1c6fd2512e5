"""Text primitives: tokenization, shingling, deterministic hashing.

The polynomial hash ``h = fold(h*31 + ascii(c)) mod 1_000_000_007`` is chosen
over builtin xxhash64/md5-prefix tricks because it is exactly expressible in
both Spark SQL (aggregate/transform) and DuckDB (list_reduce/list_transform),
making every downstream operator (fingerprint, MinHash, SimHash) oracle-
verifiable bit-for-bit. All integer arithmetic stays within int64
(max acc ~1e9*31 + 127 << 2^63).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
MULT = 31


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped (trailing-space safe)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda t: t != F.lit(""))


_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(text: Column | str) -> Column:
    """Engine-neutral ASCII case fold: ``translate`` over [A-Z] only.

    NOT ``lower()`` — the JVM applies full Unicode case mapping (U+0130
    'İ' lowers to the TWO-codepoint 'i̇') where DuckDB's utf8proc applies
    simple mapping ('i'), so any ``lower()``-normalized comparison can
    diverge cross-engine on special-cased uppercase input (round-13
    review; the same divergence class BPE_PATTERN's case-explicit classes
    close). A character-for-character [A-Z]→[a-z] translate is identical
    on every engine and sufficient wherever the comparison targets are
    pure-ASCII words (stopword lists)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.translate(c, _ASCII_UPPER, _ASCII_LOWER)


# DuckDB spelling of the same fold (translate is PostgreSQL-compatible on
# both engines; `{x}` is the string expression to fold)
DUCK_ASCII_LOWER = f"translate({{x}}, '{_ASCII_UPPER}', '{_ASCII_LOWER}')"


def poly_hash(text: Column | str) -> Column:
    """Deterministic int64 polynomial rolling hash over characters.

    Char split uses ``regexp_extract_all(x, '(?s).', 0)`` — Java regex
    ``.`` matches one CODE POINT, so a surrogate pair stays one element
    whose ``ascii()`` is the full code point, exactly like DuckDB's
    ``string_split(x, '')`` (round-12 review: the previous
    ``split(x, "(?!$)")`` split astral-plane characters into two lone
    surrogates — 2 fold steps and mangled values on Spark vs 1 on DuckDB,
    so every hash-verified dedup/BPE operator diverged on the first emoji;
    probed bit-identical now on ASCII/accented/special-cased/astral
    inputs, and the empty string still folds to 0 on both engines)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.aggregate(
        F.regexp_extract_all(c, F.lit(r"(?s)."), 0),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * MULT + F.ascii(ch)) % F.lit(MOD).cast("long"),
    )


def shingles(tok: Column, k: int = 3) -> Column:
    """k-token shingles (space-joined); documents shorter than k tokens
    fall back to a single whole-document shingle."""
    return F.when(
        F.size(tok) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(tok) - k),
            lambda i: F.concat_ws(" ", F.slice(tok, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", tok)))


# SQL-text versions for the DuckDB oracle side (same arithmetic, DuckDB
# list-function spellings). `{x}` is the string expression to hash.
DUCK_TOKENS = "list_filter(string_split({x}, ' '), t -> t <> '')"
DUCK_POLY_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({x}, ''), c -> CAST(ascii(c) AS BIGINT))), "
    "(a, b) -> (a * 31 + b) % 1000000007)"
)
