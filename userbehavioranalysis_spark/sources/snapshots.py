"""Snapshot-versioned parquet tables: reproducible corpus pinning.

The missing piece between "a directory of parquet" and a table format:
a TRAINING RUN must be able to pin the exact corpus version it read —
months later, after daily appends, compactions and retention sweeps —
or the run is unreproducible.  Delta/Iceberg solve this with manifest
logs; this module implements the same semantics at the layout level
with nothing but parquet files and JSON manifests, so the mechanics
stay visible and testable:

- ``{path}/data/``            immutable parquet files, never rewritten
  in place; every writer adds NEW files under a unique prefix.
- ``{path}/_snapshots/v{N}.json``  one manifest per version: the exact
  list of live data files, plus parent version and the operation that
  produced it.  A manifest is the ONLY thing that defines a version's
  content — readers never list ``data/``.

Operations (each commits a NEW version; old manifests are never
touched, so any pinned reader keeps working):

- ``snapshot_overwrite(df, path)``   new files, manifest lists them.
- ``snapshot_append(df, path)``      new files, manifest = parent's
  files + the new ones — the daily-ingest commit: no rewrite, and a
  reader pinned at the parent version never sees the new rows.
- ``snapshot_compact(path)``         rewrites the LATEST version's
  content into few files and commits it as a new version; the parent's
  files stay on disk so the parent remains readable (time travel
  through compaction — the property naive in-place compaction
  destroys).
- ``snapshot_expire(path, keep_last)``  retention: deletes data files
  referenced ONLY by expired manifests (reference counting over the
  kept ones) — storage is reclaimed without ever touching a kept
  version's files.

``snapshot_read(spark, path, version=None)`` resolves the manifest and
reads its file list EXPLICITLY (``spark.read.parquet(*files)``), so a
version's plan is insulated from everything committed after it.  At
100 TB the manifests are a few KB per version (file paths, not data)
and commits are a single JSON write after the data lands — the same
metadata-transaction shape the real formats use.  A commit is atomic
against crashes (write-to-temp + rename, so a torn manifest can never
be listed as a version) AND against concurrent writers (optimistic
concurrency: the manifest publishes via an EXCLUSIVE link that fails
if the version slot is taken, and append/overwrite retry against the
new latest — their data files already landed, so a retry is
manifest-only).  On an object store the exclusive link becomes a
conditional put (If-None-Match: *) — same protocol shape.  Compaction
does NOT auto-retry on conflict: its content is derived from the
version it read, so the caller must re-run against the new latest
(``SnapshotConflictError`` says so).
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

# A version manifest is EXACTLY v{int}.json — anything else in
# _snapshots/ (an in-flight .tmp from _commit, an editor backup, a
# partial copy) is not a version and must not brick the table.
_MANIFEST_RE = re.compile(r"^v(\d+)\.json$")


def _snap_dir(path: str) -> str:
    return os.path.join(path, "_snapshots")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_snap_dir(path), f"v{version}.json")


def snapshot_versions(path: str) -> list[int]:
    """All committed versions, ascending (empty list = no table)."""
    d = _snap_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(m.group(1))
        for f in os.listdir(d)
        if (m := _MANIFEST_RE.match(f))
    )


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


class SnapshotConflictError(RuntimeError):
    """A concurrent writer committed the version slot first.  Appends
    and overwrites retry internally (manifest-only — their data files
    already landed); compaction surfaces this so the caller re-runs
    against the new latest (its rewritten content is derived from the
    version it read, so a blind retry would publish stale content)."""


def _try_commit(
    path: str,
    files: list[str],
    op: str,
    parent: int | None,
    schema: dict | None = None,
    partition_by: list[str] | None = None,
    extra: dict | None = None,
) -> int:
    """One OPTIMISTIC commit attempt at version ``parent + 1``.
    ``schema`` (a StructType jsonValue) rides the manifest so reads
    resolve the version's schema WITHOUT footer inference — and so
    schema EVOLUTION works: a version whose lineage spans a column
    addition reads old files through the widened schema (missing
    columns come back NULL), no mergeSchema footer pass at any scale.

    Crash-atomic AND concurrency-safe: the manifest is fully written
    (and fsynced) to a writer-unique temp name, then published with an
    EXCLUSIVE hard link — ``os.link`` fails with FileExistsError if
    another writer took the slot, in which case nothing is published
    and :class:`SnapshotConflictError` is raised (``os.replace`` here
    would silently CLOBBER the winner's manifest, orphaning its data).
    A torn temp file from a crash is invisible (_MANIFEST_RE skips
    non-v{N}.json names) and reclaimed by :func:`snapshot_vacuum`'s
    manifest-dir sweep.  On an object store the link becomes a
    conditional put (If-None-Match: *).
    """
    os.makedirs(_snap_dir(path), exist_ok=True)
    version = (parent or 0) + 1
    manifest = {
        "version": version,
        "parent": parent,
        "operation": op,
        "files": sorted(files),
    }
    if schema is not None:
        manifest["schema"] = schema
    if partition_by:
        manifest["partition_by"] = list(partition_by)
    if extra:
        manifest.update(extra)
    final = _manifest_path(path, version)
    tmp = f"{final}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise SnapshotConflictError(
            f"version {version} at {path!r} was committed by a concurrent "
            f"writer; re-read the latest version and retry the {op}"
        ) from None
    finally:
        os.unlink(tmp)
    return version


def _commit_with_retry(
    path: str,
    files_for_parent,
    op: str,
    max_retries: int = 20,
    schema_for_parent=None,
    partition_by: list[str] | None = None,
) -> int:
    """Optimistic-concurrency loop shared by append and overwrite:
    re-read the latest version, derive the file list for that parent
    (``files_for_parent(parent_manifest_or_None)``), attempt the
    exclusive commit, and on conflict loop against the new latest.
    Bounded: a busy table with 20 racing commits in one window is a
    coordination smell, not a retry problem."""
    for _ in range(max_retries):
        vs = snapshot_versions(path)
        parent = _read_manifest(path, vs[-1]) if vs else None
        try:
            return _try_commit(
                path,
                files_for_parent(parent),
                op,
                parent["version"] if parent else None,
                schema=schema_for_parent(parent) if schema_for_parent else None,
                partition_by=partition_by,
            )
        except SnapshotConflictError:
            continue
    raise SnapshotConflictError(
        f"gave up committing {op} at {path!r} after {max_retries} conflicts"
    )


def _evolved_schema(parent: dict | None, df: DataFrame) -> dict:
    """Schema for an append commit: the parent's manifest schema plus
    any NEW columns the batch introduces (appended at the end, so a
    pinned reader's column positions never shift).  A same-name column
    with a DIFFERENT type refuses loudly — silently coercing would
    corrupt either the old files' reads or the new ones'.  A legacy
    parent without a recorded schema evolves from the batch's schema
    alone (its old files still read by inference until a compaction
    rewrites them)."""
    from pyspark.sql.types import StructType

    if parent is None or "schema" not in parent:
        return df.schema.jsonValue()
    merged = StructType.fromJson(parent["schema"])
    have = {f.name: f.dataType for f in merged.fields}
    for f in df.schema.fields:
        if f.name not in have:
            merged = merged.add(f)
        elif have[f.name] != f.dataType:
            raise ValueError(
                f"append changes column {f.name!r} from {have[f.name]} to "
                f"{f.dataType}; type changes need an explicit rewrite "
                "(snapshot_overwrite), not an append"
            )
    return merged.jsonValue()


def _write_new_files(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> list[str]:
    """Land a DataFrame as immutable files under data/ and return
    their table-relative paths.

    Flat layout: one staging subdir per commit (data/<uuid>/...) keeps
    concurrent writers from colliding and the new-file set trivially
    enumerable.

    Partitioned layout: the Hive directories must sit at a FIXED depth
    (data/col=val/...) for Spark's partition discovery to accept an
    explicit multi-file list under one basePath — per-commit stamp
    dirs between data/ and col=val/ make the structures "conflict".
    So the commit writes partitionBy into a private staging dir, then
    MOVES each leaf file to data/<col=val...>/<stamp>-<i>.parquet
    (renames within one filesystem; an object store does the same
    with per-file copies, still metadata-bounded by the commit's own
    file count).  ``repartition`` by the partition columns first keeps
    it to one file per partition value per commit (the writers.py
    discipline), and the stamp prefix keeps concurrent commits from
    colliding inside a shared partition directory."""
    stamp = uuid.uuid4().hex[:12]
    if partition_by:
        import shutil

        tmp = os.path.join(path, "data", f"_stage_{stamp}")
        df.repartition(*partition_by).write.mode("error").partitionBy(
            *partition_by
        ).parquet(tmp)
        files = []
        for root, _dirs, fs in os.walk(tmp):
            for i, f in enumerate(sorted(fs)):
                if not f.endswith(".parquet"):
                    continue
                rel_part_dir = os.path.relpath(root, tmp)
                dest_dir = os.path.join(path, "data", rel_part_dir)
                os.makedirs(dest_dir, exist_ok=True)
                dest = os.path.join(dest_dir, f"{stamp}-{i}.parquet")
                os.rename(os.path.join(root, f), dest)
                files.append(os.path.relpath(dest, path))
        shutil.rmtree(tmp)
        if files:
            return sorted(files)
        # empty partitioned commit: same schema-bearing placeholder as
        # the flat path (partition columns ride as DATA columns in the
        # file, so the explicit-schema read needs no path segments)
        out = os.path.join(path, "data", stamp)
        os.makedirs(out, exist_ok=True)
    else:
        out = os.path.join(path, "data", stamp)
        df.write.mode("error").parquet(out)
    files = [
        f for f in (os.listdir(out) if os.path.isdir(out) else [])
        if f.endswith(".parquet")
    ]
    if not files:
        # An EMPTY commit (snapshot_overwrite of an empty frame, or an
        # empty first append — e.g. a refresh day where every document
        # was screened out) writes no part files (SPARK-23271), which
        # would produce a manifest with files: [] that
        # spark.read.parquet(<zero paths>) can never read back.  Land
        # one schema-bearing empty parquet file (the writers.py
        # placeholder pattern) so EVERY committed version stays
        # readable as a valid empty table.
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        sch = to_arrow_schema(df.schema)
        name = "part-00000-empty.parquet"
        pq.write_table(
            pa.table({f.name: pa.array([], type=f.type) for f in sch}, schema=sch),
            os.path.join(out, name),
        )
        files = [name]
    return [os.path.join("data", stamp, f) for f in files]


def snapshot_overwrite(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> int:
    """Commit a full-replacement version.  Previous versions' files
    are untouched and stay readable until expired.  Concurrency-safe:
    the file list is parent-independent, so a conflict retries with
    just a version bump.

    ``partition_by`` lays the version out as Hive directories and
    records the columns in the manifest: reads then derive the
    partition columns from the paths (``basePath``) and — the point at
    100 TB — a pinned read filtered on them PRUNES to the matching
    directories of ITS OWN file list (PartitionFilters, plan-pinned in
    tests).  An overwrite may change the table's partitioning (it owns
    the whole content); appends must match it."""
    files = _write_new_files(df, path, partition_by)
    return _commit_with_retry(
        path,
        lambda _parent: files,
        "overwrite",
        schema_for_parent=lambda _parent: df.schema.jsonValue(),
        partition_by=partition_by,
    )


def snapshot_append(df: DataFrame, path: str) -> int:
    """Commit an append version: parent's file list + the new files —
    the daily-ingest commit (no rewrite; pinned readers unaffected).
    Concurrency-safe: the new files land ONCE; on a lost commit race
    the retry re-reads the new parent and re-derives the manifest
    (manifest-only, no data rewritten), so two racing appends both
    land and the final version contains both.  The table's partition
    layout comes FROM the latest manifest (an append that laid out
    directories differently would silently break pruning — the same
    manifest-wins discipline as the index signing parameters)."""
    vs = snapshot_versions(path)
    part = _read_manifest(path, vs[-1]).get("partition_by") if vs else None
    new_files = _write_new_files(df, path, part)
    return _commit_with_retry(
        path,
        lambda parent: (parent["files"] if parent else []) + new_files,
        "append",
        schema_for_parent=lambda parent: _evolved_schema(parent, df),
        partition_by=part,
    )


def _read_files(
    spark: SparkSession, path: str, m: dict, files: list[str]
) -> DataFrame:
    """Read an explicit file subset under a version's manifest rules:
    the recorded schema applies verbatim (no footer inference;
    evolution NULL-fills), and for a partitioned layout ``basePath``
    makes Spark derive the partition columns from the col=val path
    segments — so filters on them partition-prune WITHIN the explicit
    file list (the listing is the manifest's, the pruning is
    Catalyst's)."""
    reader = spark.read
    schema = None
    if "schema" in m:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(m["schema"])
        reader = reader.schema(schema)
    if m.get("partition_by"):
        reader = reader.option("basePath", path)
    df = reader.parquet(*[os.path.join(path, f) for f in files])
    if schema is not None and df.columns != schema.names:
        # Spark surfaces path-derived partition columns LAST regardless
        # of the explicit schema; re-project to the manifest's order so
        # a version's column positions are part of its contract
        df = df.select(*schema.names)
    return df


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (None = latest).  The manifest's explicit
    file list IS the dataset — files committed later are invisible, so
    the returned plan reproduces the version bit-for-bit regardless of
    subsequent appends, compactions, or (un-expired) retention."""
    vs = snapshot_versions(path)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {path!r}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not in {vs} at {path!r}")
    m = _read_manifest(path, v)
    return _read_files(spark, path, m, m["files"])


def snapshot_compact(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite the LATEST version's content into ``ceil(bytes/target)``
    files and commit as a new version.  The parent's files stay on
    disk, so time travel THROUGH the compaction keeps working — the
    property an in-place rewrite destroys; storage is reclaimed later
    by :func:`snapshot_expire` once the parent falls out of retention.

    Single commit attempt, NO retry: the rewritten content is derived
    from the version this call read, so a commit lost to a concurrent
    append must surface (:class:`SnapshotConflictError`) — re-run
    against the new latest; the orphaned rewrite files are reclaimed
    by :func:`snapshot_vacuum`.
    """
    vs = snapshot_versions(path)
    m = _read_manifest(path, vs[-1])
    part = m.get("partition_by")
    df = snapshot_read(spark, path)
    if part:
        # partitioned layout: the compaction unit is one file per
        # partition value (the helper repartitions by the columns);
        # byte-target sizing applies to the flat layout only
        files = _write_new_files(df, path, part)
    else:
        total = sum(os.path.getsize(os.path.join(path, f)) for f in m["files"])
        n_files = max(1, -(-total // target_file_bytes))
        files = _write_new_files(df.repartition(n_files), path)
    return _try_commit(
        path,
        files,
        "compact",
        vs[-1],
        schema=df.schema.jsonValue(),
        partition_by=part,
    )


def snapshot_expire(path: str, keep_last: int = 2) -> dict:
    """Retention sweep: drop all but the newest ``keep_last`` version
    manifests and delete data files referenced ONLY by dropped ones
    (reference counting over the kept manifests — a kept version's
    files are never touched).  Returns audit counts.

    STALE-PIN failure mode (inherent to retention, stated so callers
    size ``keep_last`` against their longest reader): a reader that
    pinned a version BEFORE it was expired fails afterwards — a new
    ``snapshot_read(path, v)`` raises ``ValueError`` (the manifest is
    gone, so v is not in ``snapshot_versions``), while a DataFrame
    plan resolved before the sweep fails at execution with Spark's
    FileNotFoundException once its (now-deleted) input files are
    opened.  Expiry never corrupts: every surviving version remains
    exactly readable; only expired pins break, loudly."""
    vs = snapshot_versions(path)
    if len(vs) <= keep_last:
        return {"expired_versions": 0, "deleted_files": 0}
    expired, kept = vs[:-keep_last], vs[-keep_last:]
    live = {f for v in kept for f in _read_manifest(path, v)["files"]}
    dead = {
        f for v in expired for f in _read_manifest(path, v)["files"]
    } - live
    for f in sorted(dead):
        fp = os.path.join(path, f)
        if os.path.exists(fp):
            os.remove(fp)
        d = os.path.dirname(fp)
        if os.path.isdir(d) and not os.listdir(d):
            os.rmdir(d)
    for v in expired:
        os.remove(_manifest_path(path, v))
    return {"expired_versions": len(expired), "deleted_files": len(dead)}


def snapshot_diff(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """What changed between two pinned versions — the audit/debug
    companion of time travel ("which documents entered the training
    corpus between the v3 and v7 runs?").

    Returns the to-version's schema plus a ``change`` column
    ('added' | 'removed').  Two execution paths, chosen from the
    MANIFESTS alone:

    - **File-lineage fast path**: data files are immutable and shared
      across manifests, so when one version's file list contains the
      other's, the diff is exactly the rows of the files only the
      superset lists — a scan of the DELTA files, nothing shared is
      read.  This covers the by-far-common lineages: append chains
      (added rows only) and any pair straddling no compaction.  At
      100 TB, diffing day 200 against day 201 reads one day's files.
    - **Row-level fallback**: a compaction between the two versions
      rewrites content into new files, so file identity says nothing —
      the diff falls back to two left-anti joins on ``key_cols``
      (required then; diffing full rows across a rewrite would also
      flag physically-moved identical rows if schemas ever evolve).
      Cost is a join over both versions — the honest price of diffing
      across a rewrite; run it before compaction (or against the
      compaction's parent) to stay on the fast path.

    Both paths return the same rows for the same version pair — pinned
    by the registered oracle on the append lineage and by tests across
    a compaction.
    """
    import pyspark.sql.functions as F

    ma = _read_manifest(path, from_version)
    mb = _read_manifest(path, to_version)
    a, b = set(ma["files"]), set(mb["files"])
    if a <= b or b <= a:
        added = sorted(b - a)
        removed = sorted(a - b)
        parts = []
        if added:
            parts.append(
                _read_files(spark, path, mb, added).withColumn(
                    "change", F.lit("added")
                )
            )
        if removed:
            parts.append(
                _read_files(spark, path, ma, removed).withColumn(
                    "change", F.lit("removed")
                )
            )
        if not parts:
            return snapshot_read(spark, path, to_version).limit(0).withColumn(
                "change", F.lit("")
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    if not key_cols:
        raise ValueError(
            f"versions {from_version} and {to_version} at {path!r} have "
            "divergent file lists (a compaction or overwrite sits between "
            "them), so file lineage cannot express the diff — pass "
            "key_cols for the row-level fallback"
        )
    va = snapshot_read(spark, path, from_version)
    vb = snapshot_read(spark, path, to_version)
    return (
        vb.join(va.select(key_cols), key_cols, "left_anti")
        .withColumn("change", F.lit("added"))
        .unionByName(
            va.join(vb.select(key_cols), key_cols, "left_anti").withColumn(
                "change", F.lit("removed")
            )
        )
    )


def snapshot_restore(path: str, version: int) -> int:
    """ROLLBACK: commit a NEW version whose content is an earlier
    version's — the "yesterday's refresh poisoned the corpus, roll it
    back" move.  Metadata-only at any scale: the new manifest simply
    lists the old version's (immutable, still-on-disk) files; nothing
    is copied or rewritten, history is preserved (the bad version
    stays readable for the post-mortem), and pinned readers of ANY
    version are untouched.  Concurrency-safe via the shared
    optimistic-commit loop — the restored file list is
    parent-independent, so a conflict retries with a version bump.
    Fails with ValueError if ``version`` is unknown/expired (restoring
    reclaimed files would commit a version that cannot be read)."""
    vs = snapshot_versions(path)
    if version not in vs:
        raise ValueError(f"version {version} not in {vs} at {path!r}")
    restored = _read_manifest(path, version)
    return _commit_with_retry(
        path,
        lambda _parent: restored["files"],
        "restore",
        schema_for_parent=lambda _parent: restored.get("schema"),
        partition_by=restored.get("partition_by"),
    )


def snapshot_vacuum(path: str, min_age_seconds: float = 86400.0) -> dict:
    """Garbage-collect ORPHANED artifacts: data files referenced by NO
    manifest (a writer that crashed after landing parquet but before
    its commit, or a compaction whose commit lost an optimistic race)
    and stray ``.tmp`` manifests from torn commits.  The complement of
    :func:`snapshot_expire` (which reclaims files referenced only by
    EXPIRED manifests): between the two, every byte on disk is
    accounted to a live version.

    ``min_age_seconds`` is the in-flight-writer grace period: a
    healthy writer's files are unreferenced during the window between
    its data write and its manifest commit, so only files older than
    the grace are eligible (default one day — far beyond any commit
    latency; tests pass 0).  Returns audit counts.
    """
    import time

    referenced: set[str] = set()
    for v in snapshot_versions(path):
        referenced.update(_read_manifest(path, v)["files"])
    cutoff = time.time() - min_age_seconds
    data_root = os.path.join(path, "data")
    deleted = 0
    if os.path.isdir(data_root):
        for root, _dirs, fs in os.walk(data_root):
            for f in fs:
                fp = os.path.join(root, f)
                rel = os.path.relpath(fp, path)
                if (
                    f.endswith(".parquet")
                    and rel not in referenced
                    and os.path.getmtime(fp) <= cutoff
                ):
                    os.remove(fp)
                    deleted += 1
            if not os.listdir(root) and root != data_root:
                os.rmdir(root)
    tmps = 0
    snap = _snap_dir(path)
    if os.path.isdir(snap):
        for f in os.listdir(snap):
            fp = os.path.join(snap, f)
            if f.endswith(".tmp") and os.path.getmtime(fp) <= cutoff:
                os.remove(fp)
                tmps += 1
    return {"deleted_files": deleted, "deleted_tmp_manifests": tmps}


def snapshot_append_stream_batch(
    df: DataFrame, path: str, batch_id: int, query_name: str
) -> int | None:
    """EXACTLY-ONCE streaming ingest commit: the foreachBatch body for
    using a snapshot table as a Structured Streaming SINK.

    foreachBatch alone is at-least-once — after a failure between the
    sink write and the checkpoint commit, Spark REPLAYS the batch, and
    a plain ``snapshot_append`` would commit its rows twice.  The
    manifest is the store's transaction log, so idempotence rides it:
    each stream commit records ``(stream, batch_id)``, and a replayed
    batch whose id is already in the version LINEAGE is skipped before
    any data lands (returns None).  Parquet-write + manifest-commit
    remain non-atomic — a crash between them leaves the data files
    orphaned and UNCOMMITTED (never half-visible); the replay then
    commits fresh files and :func:`snapshot_vacuum` reclaims the
    orphans.  That is the same recovery contract Delta's
    ``txnAppId/txnVersion`` idempotent writes give.

    ``query_name`` scopes the id space: two different streams into one
    table don't collide on Spark's per-query monotonic batch ids.
    The dedup follows the version LINEAGE (parent chain), which
    deliberately survives restores — rolling a poisoned table back
    must not silently re-open the door to a replay of the very batch
    that poisoned it.  To genuinely re-ingest after a rollback, start
    the stream over: fresh checkpoint + a new ``query_name``.  An
    overwrite DOES start a new id space in practice only via a new
    query_name as well — conservative by design.
    """
    seen: set[tuple[str, int]] = set()
    vs = snapshot_versions(path)
    v: int | None = vs[-1] if vs else None
    while v is not None:
        m = _read_manifest(path, v)
        sb = m.get("stream_batch")
        if sb:
            seen.add((sb["query"], sb["batch_id"]))
        v = m.get("parent")
    if (query_name, batch_id) in seen:
        return None
    vs = snapshot_versions(path)
    part = _read_manifest(path, vs[-1]).get("partition_by") if vs else None
    new_files = _write_new_files(df, path, part)

    def _files(parent):
        return (parent["files"] if parent else []) + new_files

    # the batch marker rides INSIDE the atomic commit (an
    # amend-after-publish would open a crash window where the version
    # is live but unmarked, and the replay would double-ingest)
    for _ in range(20):
        vs = snapshot_versions(path)
        parent = _read_manifest(path, vs[-1]) if vs else None
        try:
            return _try_commit(
                path,
                _files(parent),
                "stream-append",
                parent["version"] if parent else None,
                schema=_evolved_schema(parent, df),
                partition_by=part,
                extra={
                    "stream_batch": {
                        "query": query_name,
                        "batch_id": int(batch_id),
                    }
                },
            )
        except SnapshotConflictError:
            continue
    raise SnapshotConflictError(
        f"gave up committing stream batch {batch_id} at {path!r}"
    )
