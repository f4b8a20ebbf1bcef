"""Text-analysis column functions (all JVM-side, no Python UDFs).

Everything here compiles to Catalyst expressions inside whole-stage
codegen — the hot path of the 100 TB document pipeline stays off the
Python worker entirely. Equivalent DuckDB SQL for each helper is noted so
query oracles stay portable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def norm_text(col: Column | str) -> Column:
    """Normalized text: lowercase, trimmed, whitespace collapsed.

    DuckDB: ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens: collapse runs → trim → split on single space.

    Spark's (and DuckDB's) ``trim`` strips only 0x20 spaces, so splitting
    ``trim(text)`` on ``\\s+`` yields phantom empty tokens when the text
    is tab/newline-padded (caught by tests/test_properties.py). Collapsing
    all whitespace to spaces first makes trim complete.

    DuckDB: ``regexp_split_to_array(trim(regexp_replace(text, '\\s+', ' ',
    'g')), ' ')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.regexp_replace(c, r"\s+", " ")), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def word_shingles(col_name: str, k: int = 3) -> Column:
    """Distinct k-word shingles (the MinHash/Jaccard unit) from a string
    column named ``col_name``.

    Pure array expressions — ``transform(sequence(...))`` over the token
    array, no explode until the caller chooses to (keeps the narrow,
    pre-shuffle shape). DuckDB equivalent:
    ``list_distinct(list_transform(generate_series(1, len(toks)-k+1),
    i -> concat_ws(' ', toks[i], ..., toks[i+k-1])))``.

    Rows with fewer than k tokens yield an empty array (sequence start >
    stop is invalid in Spark, so the expression guards on token count).
    """
    # Bind the token array ONCE via a single-element transform lambda —
    # inlining the split into every element_at re-runs the regex split
    # O(k·len) times per row, which dominated the whole dedup pipeline.
    # Collapse-then-trim for the same phantom-empty-token reason as
    # tokens() above.
    toks = f"split(trim(regexp_replace({col_name}, '\\\\s+', ' ')), ' ')"
    return F.expr(
        f"element_at(transform(array({toks}), __t -> "
        f"CASE WHEN size(__t) >= {k} THEN "
        f"array_distinct(transform(sequence(1, size(__t) - {k - 1}), "
        f"__i -> array_join(slice(__t, __i, {k}), ' '))) "
        f"ELSE array() END), 1)"
    ).cast("array<string>")


def md5_fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (portable —
    DuckDB: ``md5(lower(trim(regexp_replace(text,'\\s+',' ','g'))))``)."""
    return F.md5(norm_text(col))


def xx_fingerprint(col: Column | str) -> Column:
    """8-BYTE document fingerprint: xxhash64 of the normalized text —
    the INTERNAL exact-dedup key for pipelines whose output never
    exposes the fingerprint (chunk_dedup_summary's exact pass): a
    BIGINT groupBy key shuffles and compares at a fraction of the
    32-char md5 string's cost. Same collision story as hashed shingles
    (~n²/2⁶⁵; injectivity on the test corpora pinned in
    tests/test_dedup.py). Anything that RETURNS a fingerprint keeps
    md5 — that is the portable oracle-visible contract."""
    return F.xxhash64(norm_text(col))
