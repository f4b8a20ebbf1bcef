"""Hidden-partitioning transforms (Iceberg's transform family).

Reference surface: ``PARTITIONED BY (year(ts), bucket(4, category),
truncate(10, id))`` (/root/reference/tests/iceberg_feature_tests.py:918-927),
``months(event_date)`` (clickhouse suite :498-503), ``day(ts), bucket(8,
id)`` (redshift suite :1240-1242).

Each transform maps a source column to a partition value column; scans
prune files by translating simple source-column predicates into partition
space (SURVEY §4 "partition pruning via hidden-partition transforms").
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date, datetime, timezone

import pyspark.sql.functions as F
from pyspark.sql import Column

# re.I: transform names are SQL function names — PARTITIONED BY
# (BUCKET(4, id)) is as legal as bucket(4, id) (found by the round-9
# CREATE TABLE grammar fuzz; parse_transform lowercases the kind)
_TRANSFORM_RE = re.compile(
    r"^\s*(?:(?P<fn>years?|months?|days?|hours?)\s*\(\s*(?P<tcol>\w+)\s*\)"
    r"|(?P<bfn>bucket|truncate)\s*\(\s*(?P<arg>\d+)\s*,\s*(?P<bcol>\w+)\s*\)"
    r"|(?P<icol>\w+))\s*$",
    re.IGNORECASE,
)


@dataclass(frozen=True)
class Transform:
    """One partition field: ``transform(source_column)``."""

    kind: str  # identity | year | month | day | hour | bucket | truncate
    source: str
    arg: int | None = None  # bucket N / truncate width

    @property
    def field_name(self) -> str:
        if self.kind == "identity":
            return self.source
        return f"{self.source}_{self.kind}"

    # PyIceberg's spec-field attribute name (tbl.spec().fields[*].name,
    # pyiceberg_feature_tests.py:453-455 asserts "ts_hour")
    @property
    def name(self) -> str:
        return self.field_name

    def spec_string(self) -> str:
        if self.kind == "identity":
            return self.source
        if self.kind in ("bucket", "truncate"):
            return f"{self.kind}({self.arg}, {self.source})"
        return f"{self.kind}({self.source})"

    def apply(self, col: Column | None = None) -> Column:
        """Partition value expression for a row."""
        c = F.col(self.source) if col is None else col
        if self.kind == "identity":
            return c
        if self.kind == "year":
            return F.year(c)
        if self.kind == "month":
            # linear month ordinal so ranges stay order-preserving
            return F.year(c) * 12 + (F.month(c) - 1)
        if self.kind == "day":
            return F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date"))
        if self.kind == "hour":
            return (c.cast("timestamp").cast("long") / 3600).cast("int")
        if self.kind == "bucket":
            return F.pmod(F.xxhash64(c), F.lit(self.arg))
        if self.kind == "truncate":
            raise ValueError("truncate needs the source dtype — use apply_typed")
        raise ValueError(f"unknown transform {self.kind}")

    def apply_typed(self, dtype: str) -> Column:
        """Like :meth:`apply` but uses the source column's data type to pick
        the truncate variant (string prefix vs numeric floor)."""
        c = F.col(self.source)
        if self.kind == "truncate":
            if dtype.startswith("string"):
                return F.substring(c, 1, self.arg)
            return c - F.pmod(c, F.lit(self.arg))
        return self.apply(c)

    # ---- predicate translation (manifest pruning) -------------------------

    def project_value(self, value) -> object | None:
        """Transform a literal from source space into partition space.
        Returns None when the transform can't project the literal (bucket
        can only project equality)."""
        if self.kind == "identity":
            return value
        if self.kind in ("year", "month", "day", "hour"):
            ts = _as_datetime(value)
            if ts is None:
                return None
            if self.kind == "year":
                return ts.year
            if self.kind == "month":
                return ts.year * 12 + (ts.month - 1)
            if self.kind == "day":
                return (ts.date() - date(1970, 1, 1)).days
            if self.kind == "hour":
                return int(ts.replace(tzinfo=timezone.utc).timestamp() // 3600)
        if self.kind == "truncate":
            if isinstance(value, str):
                return value[: self.arg]
            if isinstance(value, int):
                return value - (value % self.arg)
        return None  # bucket: handled only for equality via hash elsewhere


# ---- PyIceberg-shaped transform objects --------------------------------
#
# The reference constructs DayTransform()/HourTransform() objects for
# partition specs and update_spec().add_field
# (/root/reference/tests/pyiceberg_feature_tests.py:446,452). Each renders
# our spec string for the given source column.


class _NamedTransform:
    kind: str = ""

    def spec(self, source: str) -> str:
        return f"{self.kind}({source})"

    def __repr__(self) -> str:  # pragma: no cover - debug nicety
        return f"{type(self).__name__}()"


class YearTransform(_NamedTransform):
    kind = "year"


class MonthTransform(_NamedTransform):
    kind = "month"


class DayTransform(_NamedTransform):
    kind = "day"


class HourTransform(_NamedTransform):
    kind = "hour"


class IdentityTransform(_NamedTransform):
    kind = "identity"

    def spec(self, source: str) -> str:
        return source


class BucketTransform(_NamedTransform):
    kind = "bucket"

    def __init__(self, num_buckets: int):
        self.num_buckets = int(num_buckets)

    def spec(self, source: str) -> str:
        return f"bucket({self.num_buckets}, {source})"


class TruncateTransform(_NamedTransform):
    kind = "truncate"

    def __init__(self, width: int):
        self.width = int(width)

    def spec(self, source: str) -> str:
        return f"truncate({self.width}, {source})"


def transform_spec(source: str, transform) -> str:
    """Render (source, transform) into a spec string. ``transform`` may be
    a *Transform object (above, or anything with a ``spec(source)``
    method), a bare kind string (``"hour"``), a parameterized kind
    (``"bucket(16)"``), or already a full spec (``"hour(ts)"``)."""
    if not isinstance(transform, str):
        spec = getattr(transform, "spec", None)
        if callable(spec):
            return spec(source)
        raise TypeError(f"cannot render transform: {transform!r}")
    t = transform.strip()
    if "(" in t:
        m = re.match(r"^(bucket|truncate)\s*\(\s*(\d+)\s*\)$", t)
        if m:
            return f"{m.group(1)}({m.group(2)}, {source})"
        parsed = parse_transform(t)  # full spec — validate + check source
        if parsed.source != source:
            raise ValueError(
                f"transform {t!r} names source {parsed.source!r}, not {source!r}"
            )
        return t
    if t == "identity":
        return source
    return f"{t}({source})"


def _as_datetime(value) -> datetime | None:
    if isinstance(value, datetime):
        return value
    if isinstance(value, date):
        return datetime(value.year, value.month, value.day)
    if isinstance(value, str):
        try:
            return datetime.fromisoformat(value)
        except ValueError:
            return None
    return None


def parse_transform(spec: str) -> Transform:
    """Parse ``years(ts)`` / ``bucket(4, id)`` / ``truncate(10, s)`` /
    bare-column identity specs. Accepts both singular and plural time
    transform spellings (the reference uses both)."""
    m = _TRANSFORM_RE.match(spec)
    if not m:
        raise ValueError(f"cannot parse partition transform: {spec!r}")
    if m.group("fn"):
        kind = m.group("fn").lower().rstrip("s")
        return Transform(kind=kind, source=m.group("tcol"))
    if m.group("bfn"):
        arg = int(m.group("arg"))
        if arg < 1:
            # bucket(0,·) is pmod-by-zero at WRITE time, truncate(0,·)
            # a mod-zero at PRUNE time — reject at DDL, not mid-commit
            # (found by the round-9 CREATE TABLE grammar fuzz)
            raise ValueError(
                f"{m.group('bfn').lower()} needs a positive argument: {spec!r}"
            )
        return Transform(
            kind=m.group("bfn").lower(), source=m.group("bcol"), arg=arg
        )
    return Transform(kind="identity", source=m.group("icol"))
