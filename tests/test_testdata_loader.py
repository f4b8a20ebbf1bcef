"""The events loader must normalize ts identically for every parquet
generation the driver has shipped (NANOS in round 1, MICROS in round 2)
and under ANY session timezone — the two axes that have each broken a
round."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from iceberg_matrix_spark.sources.testdata import normalize_events_ts

# 2024-01-01 00:00:00.123456789 UTC as epoch nanos
_NANOS = 1_704_067_200_123_456_789


def _write_nanos_events(dirpath) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([_NANOS], pa.timestamp("ns")),
        }
    )
    path = str(dirpath / "events_nanos.parquet")
    pq.write_table(table, path)
    return path


def test_nanos_events_normalize_is_timezone_independent(spark, tmp_path):
    path = _write_nanos_events(tmp_path)
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        results = {}
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = spark.read.parquet(path)
            assert dict(df.dtypes)["ts"] == "bigint"  # nanosAsLong path
            [row] = normalize_events_ts(df, to="timestamp_ntz").collect()
            results[tz] = str(row["ts"])
        # identical NTZ wall-clock under every session TZ, truncated to µs
        assert set(results.values()) == {"2024-01-01 00:00:00.123456"}, results
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_micros_events_normalize_matches_duckdb(spark, sf_dir):
    import duckdb

    from iceberg_matrix_spark.sources.testdata import load_table

    got = {
        r["event_id"]: str(r["ts"])
        for r in load_table(spark, sf_dir, "events").select("event_id", "ts").limit(50).collect()
    }
    con = duckdb.connect()
    want = {
        i: str(ts)
        for i, ts in con.execute(
            f"SELECT event_id, ts FROM '{sf_dir}/events.parquet' "
            f"WHERE event_id IN ({','.join(map(str, got))})"
        ).fetchall()
    }
    assert got == want
