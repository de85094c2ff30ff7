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
be listed as a version); serializing CONCURRENT writers (two appends
racing to the same version number) is the real formats' job — this is
the I/O plan underneath.
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


def _commit(path: str, files: list[str], op: str, parent: int | None) -> int:
    os.makedirs(_snap_dir(path), exist_ok=True)
    version = (parent or 0) + 1 if parent is not None else 1
    existing = snapshot_versions(path)
    if existing:
        version = existing[-1] + 1
    manifest = {
        "version": version,
        "parent": parent,
        "operation": op,
        "files": sorted(files),
    }
    # ATOMIC publish: a version exists only once its complete manifest
    # is at v{N}.json.  json.dump straight into the final name would
    # let a crash mid-write leave a torn manifest that
    # snapshot_versions still lists — bricking snapshot_read(latest)
    # for every reader.  Write-to-temp + rename makes the commit
    # all-or-nothing (the .tmp is invisible: _MANIFEST_RE skips it).
    final = _manifest_path(path, version)
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)
    return version


def _write_new_files(df: DataFrame, path: str) -> list[str]:
    """Land a DataFrame as immutable files under data/<uuid>/ and
    return their table-relative paths.  A staging subdir per commit
    keeps concurrent writers from colliding on file names and makes
    the new-file set trivially enumerable."""
    stamp = uuid.uuid4().hex[:12]
    out = os.path.join(path, "data", stamp)
    df.write.mode("error").parquet(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
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


def snapshot_overwrite(df: DataFrame, path: str) -> int:
    """Commit a full-replacement version.  Previous versions' files
    are untouched and stay readable until expired."""
    vs = snapshot_versions(path)
    files = _write_new_files(df, path)
    return _commit(path, files, "overwrite", vs[-1] if vs else None)


def snapshot_append(df: DataFrame, path: str) -> int:
    """Commit an append version: parent's file list + the new files —
    the daily-ingest commit (no rewrite; pinned readers unaffected)."""
    vs = snapshot_versions(path)
    if not vs:
        return snapshot_overwrite(df, path)
    parent = _read_manifest(path, vs[-1])
    files = parent["files"] + _write_new_files(df, path)
    return _commit(path, files, "append", vs[-1])


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
    return spark.read.parquet(*[os.path.join(path, f) for f in m["files"]])


def snapshot_compact(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite the LATEST version's content into ``ceil(bytes/target)``
    files and commit as a new version.  The parent's files stay on
    disk, so time travel THROUGH the compaction keeps working — the
    property an in-place rewrite destroys; storage is reclaimed later
    by :func:`snapshot_expire` once the parent falls out of retention.
    """
    vs = snapshot_versions(path)
    m = _read_manifest(path, vs[-1])
    total = sum(os.path.getsize(os.path.join(path, f)) for f in m["files"])
    n_files = max(1, -(-total // target_file_bytes))
    df = snapshot_read(spark, path).repartition(n_files)
    files = _write_new_files(df, path)
    return _commit(path, files, "compact", vs[-1])


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

    a = set(_read_manifest(path, from_version)["files"])
    b = set(_read_manifest(path, to_version)["files"])
    if a <= b or b <= a:
        added = sorted(b - a)
        removed = sorted(a - b)
        parts = []
        if added:
            parts.append(
                spark.read.parquet(*[os.path.join(path, f) for f in added])
                .withColumn("change", F.lit("added"))
            )
        if removed:
            parts.append(
                spark.read.parquet(*[os.path.join(path, f) for f in removed])
                .withColumn("change", F.lit("removed"))
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
