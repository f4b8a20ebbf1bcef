"""Table maintenance procedures (SURVEY.md §2.14).

The CALL-procedure surface: ``rewrite_data_files`` (compaction,
/root/reference/tests/iceberg_feature_tests.py:853), ``expire_snapshots``
(:854-860), ``remove_orphan_files`` + ``rewrite_manifests``
(features catalog, /root/reference/src/data/features.json:88-93).
"""

from __future__ import annotations

import os
import re
import shutil

from iceberg_matrix_spark.tables.metadata import TableMetadata
from iceberg_matrix_spark.tables.table import IceLiteTable, _head


class CommitConflictError(RuntimeError):
    """A rewrite exhausted its retries against concurrent commits — the
    PUBLIC failure signal callers catch (the private ``_RewriteRestart``
    sentinel is control flow and never escapes)."""


class _RewriteRestart(Exception):
    """Concurrent row-level deletes landed mid-rewrite; restart from the
    new head (Iceberg's rewrite aborts on conflicting deletes too)."""


def _zorder_expr(live, columns: list[str], bits: int | None = None):
    """Z-value (Morton code) expression over ``columns``.

    Numeric columns are linearly scaled to ``bits``-bit integers using
    global min/max (one tiny driver-side aggregate — 2 scalars per
    column, constant regardless of table size); non-numeric columns are
    xxhash64-masked to the same width. The bit interleave itself is a
    chain of shift/and/or Catalyst expressions, so the whole z-value
    stays inside whole-stage codegen — no Python in the row path.
    Mirrors Iceberg's rewrite_data_files(strategy=>'sort',
    sort_order=>'zorder(a,b)') clustering semantics."""
    from pyspark.sql import functions as F

    # The interleaved code must fit a signed 64-bit long: bit positions go
    # up to bits*len(columns)-1, and position 63 is the sign bit (flipping
    # it would invert range order for high z-values; >=64 wraps mod 64
    # under Java shift semantics, silently colliding bits). Scale the
    # per-dimension width down so the widest bit lands at <= 62.
    if bits is None:
        bits = min(16, 62 // max(1, len(columns)))
        if bits < 1:
            # 63+ columns can't get even 1 bit each without touching the
            # sign bit / wrapping shifts — reject instead of silently
            # corrupting the code (no real table z-orders this wide)
            raise ValueError(
                f"zorder supports at most 62 columns, got {len(columns)}"
            )

    dtypes = dict(live.dtypes)
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}

    def num_expr(c: str):
        """(column as DOUBLE, is_floating), or (None, False) for
        non-numeric. DATE can't cast to DOUBLE under ANSI — route through
        unix_date (TIMESTAMP casts fine). Floating columns route through
        nanvl: one NaN would otherwise poison min/max → span=NaN → every
        row's scaled value NaN (an ANSI cast error, or a silent
        constant-0 dimension)."""
        t = dtypes.get(c, "").split("(")[0]
        if t == "date":
            return F.unix_date(F.col(c)).cast("double"), False
        if t in ("float", "double"):
            e = F.col(c).cast("double")
            return F.nanvl(e, F.lit(None).cast("double")), True
        if t in numeric or t in ("decimal", "timestamp", "timestamp_ntz"):
            return F.col(c).cast("double"), False
        return None, False

    aggs = []
    for c in columns:
        e, _fl = num_expr(c)
        if e is not None:
            aggs += [F.min(e).alias(f"__mn_{c}"), F.max(e).alias(f"__mx_{c}")]
    bounds = live.agg(*aggs).collect()[0].asDict() if aggs else {}

    mask = (1 << bits) - 1
    scaled = []
    for c in columns:
        e, floating = num_expr(c)
        if e is not None and bounds.get(f"__mn_{c}") is not None:
            mn, mx = bounds[f"__mn_{c}"], bounds[f"__mx_{c}"]
            span = (mx - mn) or 1.0
            s = F.round((e - F.lit(mn)) / F.lit(span) * F.lit(mask)).cast("long")
            s = F.least(F.greatest(s, F.lit(0)), F.lit(mask))
            if floating:
                # NaN sorts greater than every value in Spark — cluster it
                # into the top bucket to mirror that ordering
                s = F.when(F.isnan(F.col(c)), F.lit(mask).cast("long")).otherwise(s)
        else:
            # non-numeric (or all-NULL/all-NaN): hash into the same code
            # space
            s = F.pmod(F.xxhash64(F.col(c)), F.lit(mask + 1))
        scaled.append(F.coalesce(s, F.lit(0)))

    n = len(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftrightunsigned(s, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def rewrite_data_files(
    table: IceLiteTable,
    target_partitions: int | None = None,
    strategy: str = "binpack",
    columns: list[str] | None = None,
) -> dict:
    """Compaction: materialize the MoR-resolved live rows and rewrite them
    as a compact file set (op="replace"); the captured files' delete files
    are applied and dropped. Returns a summary like the Iceberg procedure.

    ``strategy`` mirrors Iceberg's rewrite_data_files strategies:

    - ``binpack`` (default): rewrite as-is (optionally repartitioned).
    - ``sort``: range-repartition + sort within partitions on ``columns``
      (default: the table's registered sort order, see
      ``replace_sort_order``) so each output file covers a disjoint key
      range — manifest min/max pruning then skips files for range
      predicates. At 100 TB this is the difference between scanning the
      whole table and scanning one file per point query.
    - ``zorder``: cluster on the Morton interleave of ``columns`` so
      min/max bounds tighten on EVERY z-dimension at once — multi-column
      predicates prune files that a single-column sort cannot.

    Concurrency contract (what lets this run inside a live streaming job,
    flink_feature_tests.py:1100-1172): the expensive rewrite happens ONCE,
    before the commit loop; the commit then replaces only the captured
    victim files in whatever head exists at commit time, so concurrent
    APPENDS merge cleanly instead of forcing a re-write. Concurrent
    row-level DELETES against the victim set abort and restart the whole
    rewrite — same as Iceberg's conflicting-delete validation."""

    from pyspark.sql import functions as F

    if strategy not in ("binpack", "sort", "zorder"):
        raise ValueError(f"unknown rewrite strategy: {strategy!r}")

    for _attempt in range(5):
        table.refresh()
        parent = table._current_snapshot()
        if parent is None:
            raise ValueError("nothing to compact")
        live = table._read_snapshot(parent, with_meta=False)
        if strategy == "sort":
            if columns:
                fields = []
                for c in columns:
                    parts = c.split()
                    direction = parts[1].lower() if len(parts) > 1 else "asc"
                    if direction not in ("asc", "desc"):
                        raise ValueError(f"bad sort direction: {c!r}")
                    fields.append({"column": parts[0], "direction": direction})
            else:
                fields = table.sort_order_fields()
            if not fields:
                raise ValueError(
                    "strategy='sort' needs columns= or a table sort order "
                    "(replace_sort_order)"
                )
            order = [
                F.col(f["column"]).desc() if f["direction"] == "desc" else F.col(f["column"]).asc()
                for f in fields
            ]
            n = target_partitions or int(
                table.spark.conf.get("spark.sql.shuffle.partitions")
            )
            live = live.repartitionByRange(n, *order).sortWithinPartitions(*order)
        elif strategy == "zorder":
            if not columns:
                raise ValueError("strategy='zorder' needs columns=")
            n = target_partitions or int(
                table.spark.conf.get("spark.sql.shuffle.partitions")
            )
            zv = _zorder_expr(live, columns)
            live = (
                live.withColumn("__z", zv)
                .repartitionByRange(n, F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        elif target_partitions:
            live = live.repartition(target_partitions)
        else:
            # size-aware binpack: coalesce (no shuffle — merges read
            # splits, Iceberg's binpack grouping) toward
            # write.target-file-size-bytes so compaction emits ~target-
            # sized files instead of one file per input split
            target_bytes = int(
                table.meta.properties.get(
                    "write.target-file-size-bytes", str(512 * 1024 * 1024)
                )
            )
            total = sum(f.file_size_bytes for f in parent.data_files)
            n = max(1, -(-total // max(target_bytes, 1)))
            live = live.coalesce(n)
        # heavy distributed write, outside the optimistic-commit loop.
        # (No meta= here: the commit's meta object doesn't exist yet, so a
        # shred-enabled table whose schema was never cached by an append
        # re-infers per compaction — one bounded 256-row-sample job, noise
        # next to the rewrite itself. When an append HAS cached the
        # schema, this read uses it, keeping files consistent.)
        entries = table._write_data_files(
            live, table.meta.current_schema_id, parent.sequence_number + 1
        )
        victims = {f.path for f in parent.data_files}
        base_seq = parent.sequence_number

        def mutate(meta: TableMetadata) -> TableMetadata:
            head = _head(meta)
            if any(d.sequence_number > base_seq for d in head.delete_files):
                raise _RewriteRestart()
            # a concurrent COPY-ON-WRITE delete/update (or another rewrite)
            # REPLACES victim files without adding delete files — if any
            # victim vanished from the head, committing our rewritten copy
            # of it would resurrect its deleted rows and duplicate its
            # survivors. Restart against the new head.
            if victims - {f.path for f in head.data_files}:
                raise _RewriteRestart()
            meta.last_sequence_number += 1
            for e in entries:
                e.sequence_number = meta.last_sequence_number
                # a failed attempt's _snapshot may have assigned V3 row-id
                # ranges that a concurrent winner also consumed; reset so
                # the retry draws fresh ids from the refreshed metadata
                e.first_row_id = None
            keep = [f for f in head.data_files if f.path not in victims]
            # the delete-conflict guard above means every surviving delete
            # file targeted only victim files — all dead after the rewrite
            return table._snapshot(
                meta,
                "replace",
                keep + entries,
                [],
                head,
                "main",
                {
                    "rewritten-data-files": len(victims),
                    "added-data-files-compact": len(entries),
                },
            )

        try:
            table._commit(mutate)
            break
        except _RewriteRestart:
            # this attempt's rewritten files were never committed —
            # reclaim them now instead of leaving a full table copy per
            # restart for remove_orphan_files
            for d in {_commit_dir_of(e.path, table.location) for e in entries}:
                shutil.rmtree(d, ignore_errors=True)
            continue
    else:
        raise CommitConflictError(
            "rewrite_data_files gave up after 5 restarts: concurrent "
            "row-level changes kept landing mid-rewrite (the final "
            "attempt's uncommitted output is reclaimed by "
            "remove_orphan_files)"
        )

    snap = table._current_snapshot()
    return {
        "rewritten_data_files_count": int(snap.summary["rewritten-data-files"]),
        # NOT len(snap.data_files): concurrent appends merged past this
        # commit also live in the snapshot
        "added_data_files_count": int(snap.summary["added-data-files-compact"]),
    }


def _commit_dir_of(path: str, location: str) -> str:
    """The data/c-<uuid> commit dir containing ``path`` (entry paths are
    part files, possibly under partition subdirectories)."""
    droot = os.path.join(location, "data")
    p = os.path.dirname(path)
    while os.path.dirname(p) != droot and os.path.dirname(p) != p:
        p = os.path.dirname(p)
    return p


def expire_snapshots(
    table: IceLiteTable,
    older_than_ms: int | None = None,
    retain_last: int = 1,
) -> dict:
    """Expire snapshots older than the cutoff while retaining the last N
    and every ref target; physically deletes files referenced only by
    expired snapshots (the reference asserts count-after-expiry,
    iceberg_feature_tests.py:854-860)."""

    removed_files: list[str] = []

    def mutate(meta: TableMetadata) -> TableMetadata:
        # reset on every attempt: an optimistic-commit retry recomputes
        # against refreshed metadata, and stale paths from a failed attempt
        # must not drive physical deletion (they may be live in the new head)
        removed_files.clear()
        keep_ids = {r.snapshot_id for r in meta.refs.values()}
        ordered = sorted(meta.snapshots, key=lambda s: s.snapshot_id)
        keep_ids.update(s.snapshot_id for s in ordered[-max(1, retain_last):])
        expired = [
            s
            for s in ordered
            if s.snapshot_id not in keep_ids
            and (older_than_ms is None or s.timestamp_ms < older_than_ms)
        ]
        if not expired:
            return meta
        survivors = [s for s in meta.snapshots if s not in expired]
        live_paths = {
            f.path for s in survivors for f in s.data_files
        } | {d.path for s in survivors for d in s.delete_files}
        for s in expired:
            for f in s.data_files:
                if f.path not in live_paths:
                    removed_files.append(f.path)
            for d in s.delete_files:
                if d.path not in live_paths:
                    removed_files.append(d.path)
        meta.snapshots = survivors
        return meta

    table._commit(mutate)
    deleted = 0
    for path in set(removed_files):
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
            deleted += 1
        elif os.path.isfile(path):
            os.remove(path)
            deleted += 1
    return {"deleted_data_files_count": deleted}


def remove_orphan_files(
    table: IceLiteTable, dry_run: bool = False, older_than_ms: int | None = None
) -> list[str]:
    """Delete data/delete files not referenced by ANY snapshot (e.g. from
    failed commits).

    Two guards against deleting files that are about to BECOME
    referenced (the same hazards Iceberg's procedure guards):

    - the handle is refreshed first, so files committed since the handle
      was loaded are seen as referenced, not orphaned;
    - only files last modified before ``older_than_ms`` are removed —
      default 3 days ago, Iceberg's default — because DML and rewrites
      deliberately write parquet BEFORE their optimistic-commit loop;
      an in-flight writer's pre-commit output is young, not orphaned.
    """
    import time as _time

    table.refresh()
    cutoff_ms = (
        older_than_ms
        if older_than_ms is not None
        else int(_time.time() * 1000) - 3 * 86400 * 1000
    )
    referenced: set[str] = set()
    for s in table.meta.snapshots:
        referenced.update(f.path for f in s.data_files)
        referenced.update(d.path for d in s.delete_files)

    orphans: list[str] = []
    data_root = os.path.join(table.location, "data")
    for root in (data_root, os.path.join(table.location, "deletes")):
        if not os.path.isdir(root):
            continue
        for entry in os.scandir(root):
            # commit dirs under data/, delete dirs under deletes/
            if entry.is_dir():
                files_in, newest_ms = [], entry.stat().st_mtime * 1000
                for r, _d, names in os.walk(entry.path):
                    for n in names:
                        p = os.path.join(r, n)
                        newest_ms = max(newest_ms, os.path.getmtime(p) * 1000)
                        if n.endswith(".parquet"):
                            files_in.append(p)
                if entry.path in referenced:
                    continue
                if newest_ms >= cutoff_ms:
                    continue  # young enough to be an in-flight write
                if not any(p in referenced for p in files_in):
                    orphans.append(entry.path)
    if not dry_run:
        for path in orphans:
            shutil.rmtree(path, ignore_errors=True)
    return sorted(orphans)


def rewrite_manifests(table: IceLiteTable) -> dict:
    """Compact the metadata chain: reclaim every version file below the
    current head (the manifest-rewrite analog; older versions are
    superseded).

    Old version files are TRUNCATED to zero bytes, never unlinked: the
    commit protocol detects conflicts by exclusive-create of
    v{N}.metadata.json (metadata.py:commit_metadata), so a writer holding
    a stale version k must keep colliding with the existing v{k+1} — if
    it were removed, that writer's commit would "succeed" at a version
    below head and be silently invisible (a lost update). Truncation
    reclaims the bytes while keeping the name as a tombstone; head
    resolution (max version number) and the embedded metadata_log are
    unaffected. Versions STRICTLY BELOW the refreshed head are compacted,
    so a commit racing this procedure (which always lands above head) is
    never touched."""
    head = table.refresh().version
    mdir = os.path.join(table.location, "metadata")
    removed = 0
    for name in os.listdir(mdir):
        m = re.match(r"v(\d+)\.metadata\.json$", name)
        if not m or int(m.group(1)) >= head:
            continue
        p = os.path.join(mdir, name)
        if os.path.getsize(p) > 0:
            with open(p, "w"):
                pass  # truncate in place
            removed += 1
    return {"rewritten_manifests_count": removed}


def rewrite_position_deletes(table: IceLiteTable) -> dict:
    """Consolidate accumulated position-delete files into one (Iceberg's
    ``rewrite_position_delete_files`` procedure): every MoR read anti-
    joins each outstanding delete file, so N per-commit files cost N
    inputs per scan — consolidation restores O(1). Dangling entries
    pointing at data files no longer in the head snapshot are dropped.

    Concurrency contract mirrors rewrite_data_files: the distributed
    dedup+write happens once, before the commit loop; the commit restarts
    if the head's position-delete set changed (a concurrent MoR DELETE
    landed), and merges cleanly past concurrent appends.
    """
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.tables.table import _file_uri

    for _attempt in range(5):
        table.refresh()
        head = table._current_snapshot()
        if head is None:
            raise ValueError("nothing to rewrite: empty table")
        pos = [d for d in head.delete_files if d.content == 1]
        if len(pos) <= 1:
            return {"rewritten_delete_files_count": 0, "added_delete_files_count": 0}
        live = sorted(_file_uri(f.path) for f in head.data_files)
        dels = (
            table.spark.read.parquet(*[d.path for d in pos])
            .select("file_path", "pos")
            .distinct()
            .filter(F.col("file_path").isin(live))
        )
        max_seq = max(d.sequence_number for d in pos)
        entry = table._write_delete_file(dels, content=1, sequence_number=max_seq)
        known = {d.path for d in pos}

        def mutate(meta: TableMetadata) -> TableMetadata:
            h = _head(meta)
            if {d.path for d in h.delete_files if d.content == 1} != known:
                raise _RewriteRestart()  # concurrent MoR delete: recompute
            keep = [d for d in h.delete_files if d.content != 1]
            meta.last_sequence_number += 1
            return table._snapshot(
                meta,
                "replace",
                h.data_files,
                keep + [entry],
                h,
                "main",
                {
                    "rewritten-delete-files": len(known),
                    "added-delete-files": 1,
                },
            )

        try:
            table._commit(mutate)
            return {
                "rewritten_delete_files_count": len(known),
                "added_delete_files_count": 1,
            }
        except _RewriteRestart:
            # the consolidated delete file written this attempt was never
            # committed — reclaim it now instead of leaving an orphan for
            # remove_orphan_files
            shutil.rmtree(entry.path, ignore_errors=True)
            continue
    raise CommitConflictError(
        "rewrite_position_deletes gave up after 5 restarts: concurrent "
        "MoR deletes kept landing mid-consolidation"
    )


def compute_table_statistics(table: IceLiteTable, columns: list[str] | None = None) -> dict:
    """Iceberg's ``compute_table_stats`` procedure shape: per-column NDV
    sketches for the CURRENT snapshot, persisted as a statistics file
    under metadata/ and registered in the metadata.json ``statistics``
    list (one entry per analyzed snapshot; re-analyzing replaces it).

    Real Iceberg writes Apache DataSketches theta blobs in a Puffin file;
    IceLite writes the deterministic KMV sketch estimates
    (operators/scale.py — same estimator, engine-portable hash) as JSON.
    Scale: one aggregation pass per column, each shuffling at most k
    hashes per partition — never the distinct set itself.
    """
    import json as _json

    import pyspark.sql.functions as F

    from iceberg_matrix_spark.operators.scale import _KMV_SPACE, KMV_K

    table.refresh()
    head = table._current_snapshot()
    if head is None:
        raise ValueError("cannot compute statistics on an empty table")
    df = table.df()
    cols = columns or df.columns
    # ONE scan for every column: per-partition k-smallest hash sets for
    # all columns in a single aggregation, merged into one sketch row
    # (KMV of a union = KMV of merged KMVs). A zero-row head degrades to
    # empty sketches → NDV 0.0, not a crash.
    k = KMV_K
    ncols = len(cols)
    hashes = df.select(
        *[
            F.conv(F.substring(F.md5(F.col(c).cast("string")), 1, 15), 16, 10)
            .cast("long")
            .alias(f"__h{i}")
            for i, c in enumerate(cols)
        ],
    )

    # Per-partition k-smallest via Arrow-batched mapInPandas with a
    # RUNNING k-bounded buffer: memory is O(k + arrow-batch), never the
    # partition's distinct set (a collect_set here would buffer the full
    # per-partition NDV before any slice — an OOM risk on
    # high-cardinality columns at scale). Hashing stays JVM-side; only
    # the k-min selection crosses to Python.
    def _k_smallest(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        mins = [np.empty(0, dtype=np.int64) for _ in range(ncols)]
        for pdf in batches:
            for i in range(ncols):
                vals = pdf[f"__h{i}"].dropna()
                if len(vals):
                    merged_arr = np.unique(
                        np.concatenate([mins[i], vals.to_numpy(dtype=np.int64)])
                    )
                    mins[i] = merged_arr[:k]
        yield pd.DataFrame({f"__m{i}": [mins[i].tolist()] for i in range(ncols)})

    per_part = hashes.mapInPandas(
        _k_smallest, schema=", ".join(f"__m{i} array<bigint>" for i in range(ncols))
    )
    merged = per_part.agg(
        *[
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list(f"__m{i}")))),
                1,
                k,
            ).alias(f"__m{i}")
            for i in range(len(cols))
        ]
    ).collect()[0]
    ndv: dict[str, float] = {}
    for i, c in enumerate(cols):
        mins = merged[f"__m{i}"] or []
        if len(mins) < k:
            ndv[c] = float(len(mins))
        else:
            ndv[c] = float(k - 1) / (float(mins[k - 1]) / _KMV_SPACE)

    sdir = os.path.join(table.location, "metadata")
    path = os.path.join(sdir, f"stats-{head.snapshot_id}.json")
    with open(path, "w") as f:
        _json.dump(
            {"snapshot_id": head.snapshot_id, "blob_type": "kmv-ndv-v1", "ndv": ndv},
            f,
            indent=1,
        )

    def mutate(meta: TableMetadata) -> TableMetadata:
        meta.statistics = [
            s for s in meta.statistics if s["snapshot_id"] != head.snapshot_id
        ] + [
            {
                "snapshot_id": head.snapshot_id,
                "statistics_path": path,
                "blob_type": "kmv-ndv-v1",
                "columns": sorted(ndv),
            }
        ]
        return meta

    table._commit(mutate)
    return {"analyzed_columns": len(ndv), "statistics_path": path, "ndv": ndv}
