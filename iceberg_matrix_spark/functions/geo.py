"""Geospatial column functions: WKB points + bbox predicates, JVM-side.

The reference exercises V3 GEOMETRY(4326)/GEOGRAPHY(4326) storage
(/root/reference/tests/iceberg_feature_tests.py:1386-1394). This Spark
build ships the SRID-parameterised types and the WKB io routines
(``st_geomfromwkb`` / ``st_geogfromwkb`` / ``st_asbinary`` /
``st_setsrid`` / ``st_srid`` — probed, see conformance ``t_geospatial``)
but NO constructors or spatial predicates (no ST_Point, no ST_Contains).
This module supplies the missing pieces over standard WKB bytes:

- ``wkb_point(x, y)``   — little-endian WKB point from ANY double coords
- ``wkb_x`` / ``wkb_y`` — exact double decode from a WKB point
- ``bbox_contains``     — decode + range predicate
- ``to_geometry``/``to_geography``/``geometry_to_wkb`` — native-type glue

IEEE754 <-> long bits goes through ``reflect('java.lang.Double',
'doubleToRawLongBits'/'longBitsToDouble')`` + ``Long.reverseBytes`` for
the endianness flip: tiny expression trees (~20 nodes per coordinate)
that stay inside whole-stage codegen, bit-exact for every double
(including subnormals — Java's Double.toString/parse round-trip is
exact), and entirely JVM-side. The first implementation assembled the
bits with hex-string arithmetic instead; its expression trees blew the
generated ``processNext()`` past janino's 64 KB method limit, dropping
the whole stage to interpreted evaluation (196 s → 2 s at sf0.1 for the
same query). Byte-pinned against ``struct.pack`` in tests/test_geo.py.

WKB point layout: 1 byte order (01 = little-endian), uint32 type
(01000000 = Point), two 8-byte LE doubles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _reflect_long(cls: str, method: str, arg: Column) -> Column:
    """Static JVM call returning a long (reflect emits string; the cast
    back is exact for integral values)."""
    return F.call_function("reflect", F.lit(cls), F.lit(method), arg).cast("bigint")


def _double_bits(v: Column) -> Column:
    """IEEE754 bits of a double as a signed long (raw, preserves -0.0)."""
    return _reflect_long("java.lang.Double", "doubleToRawLongBits", v.cast("double"))


def _bits_double(bits: Column) -> Column:
    """Signed-long bits → double. Java's Double.toString emits the
    shortest round-trip decimal, so string-typed reflect output casts
    back to the EXACT double — including subnormals."""
    return F.call_function(
        "reflect", F.lit("java.lang.Double"), F.lit("longBitsToDouble"), bits
    ).cast("double")


def _swap64(bits: Column) -> Column:
    return _reflect_long("java.lang.Long", "reverseBytes", bits)


def _le8(v: Column) -> Column:
    """A double column → its 8 little-endian IEEE754 bytes."""
    return F.unhex(F.lpad(F.hex(_swap64(_double_bits(v))), 16, "0"))


def _parse_le_double(wkb: Column, offset: int) -> Column:
    """Exact double from 8 LE bytes at 1-based ``offset``: hex → signed
    64 bits (32-bit halves + shift, so the sign bit never overflows) →
    byte swap → bits-to-double."""
    hx = F.hex(F.substring(wkb, offset, 8))
    bits_le = F.shiftleft(
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint"), 32
    ).bitwiseOR(F.conv(F.substring(hx, 9, 8), 16, 10).cast("bigint"))
    return _bits_double(_swap64(bits_le))


# ------------------------------------------------------------------ public


def wkb_point(x: Column | str, y: Column | str) -> Column:
    """Standard little-endian WKB Point from any numeric coordinates.

    Bytes are pinned against ``struct.pack('<BIdd', 1, 1, x, y)`` in
    tests/test_geo.py for integers, fractions, negatives and subnormals.
    """
    return F.concat(
        F.unhex(F.lit("0101000000")),  # little-endian order + Point type
        _le8(_c(x)),
        _le8(_c(y)),
    )


def wkb_x(wkb: Column | str) -> Column:
    """X (lon) coordinate of a WKB point (little-endian layout)."""
    return _parse_le_double(_c(wkb), 6)


def wkb_y(wkb: Column | str) -> Column:
    """Y (lat) coordinate of a WKB point (little-endian layout)."""
    return _parse_le_double(_c(wkb), 14)


def bbox_contains(
    wkb: Column | str,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
) -> Column:
    """True when the WKB point lies in the closed box — plain Catalyst
    comparisons over the decoded coordinates."""
    g = _c(wkb)
    return wkb_x(g).between(F.lit(xmin), F.lit(xmax)) & wkb_y(g).between(
        F.lit(ymin), F.lit(ymax)
    )


# ------------------------------------------- native GEOMETRY/GEOGRAPHY glue


def to_geometry(wkb: Column | str, srid: int = 4326) -> Column:
    """WKB bytes → native GEOMETRY(srid) (needs spark.sql.geospatial.enabled)."""
    return F.expr(f"st_setsrid(st_geomfromwkb({_as_sql(wkb)}), {srid})")


def to_geography(wkb: Column | str, srid: int = 4326) -> Column:
    """WKB bytes → native GEOGRAPHY(srid)."""
    return F.expr(f"st_geogfromwkb({_as_sql(wkb)}, {srid})")


def geometry_to_wkb(geom: Column | str) -> Column:
    """Native GEOMETRY/GEOGRAPHY → WKB bytes (st_asbinary)."""
    return F.expr(f"st_asbinary({_as_sql(geom)})")


def _as_sql(col: Column | str) -> str:
    if isinstance(col, str):
        return col
    raise TypeError(
        "native-type glue takes a column NAME (the expression goes "
        "through F.expr); pass the column's name, not a Column"
    )
