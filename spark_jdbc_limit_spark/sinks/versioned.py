"""Versioned snapshot store: time travel + zero-copy append on parquet.

The atomic sink (transactional.py) gives all-or-nothing VISIBILITY of the
latest state — the reference's contract (ExtJdbcUtils.scala:70-109) and
nothing more: history is destroyed on every overwrite. This module keeps
it, Iceberg/Delta-style, from the same public primitives (Hadoop
FileSystem renames; no table-format library):

Layout::

    table/
      v1/ _manifest.json  part-*.parquet
      v2/ _manifest.json  part-*.parquet      (append: only NEW files)
      v3/ _manifest.json  part-*.parquet      (overwrite: fresh file set)

Each ``_manifest.json`` lists the table-root-relative data files of that
SNAPSHOT — an append's manifest references the parent snapshot's files
PLUS its own delta, so appending never rewrites or copies a byte
(manifests grow, data does not move). Commit protocol per version:

1. write data files into the new ``v{N}/`` dir (plain distributed write;
   a crash leaves a manifest-less dir readers never see),
2. write ``v{N}/_manifest.tmp``,
3. rename it to ``v{N}/_manifest.json`` — rename-to-fresh-name is the
   atomic commit point on HDFS-compatible filesystems; the version is
   visible iff the manifest exists.

Readers resolve a snapshot entirely from its manifest (``version=None``
→ highest committed version) and hand the file list to
``spark.read.parquet(*files)`` — partition-parallel scan, no listing of
data dirs, so stale/uncommitted/foreign files in the tree are inert.

``vacuum`` deletes versions beyond a retention window — but keeps every
FILE still referenced by a retained manifest (an old overwrite's files
die with it; an old append's files live as long as a retained descendant
references them), then drops manifest-less orphan dirs.

SINGLE WRITER, like the atomic sink: version allocation is
max(committed)+1 with no lock. Multi-writer commit coordination
(optimistic manifest CAS) is exactly what the real table formats add on
top of this identical layout.

At 100 TB: manifests are file LISTS (thousands of entries, KBs-MBs) —
the snapshot metadata is O(files), never O(rows); time travel, rollback
(re-point to an old version = just read it; promote = one new manifest)
and incremental consumption (diff two manifests) all cost metadata only.
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import DataFrame, SparkSession

from spark_jdbc_limit_spark.sinks.transactional import AtomicWriteError, _hadoop_fs

_MANIFEST = "_manifest.json"


def _list_committed(jvm, fs, table_path) -> dict[int, object]:
    """{version: vdir Path} for every committed version dir."""
    out: dict[int, object] = {}
    if not fs.exists(table_path):
        return out
    for st in fs.listStatus(table_path):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v")):
            continue
        try:
            n = int(name[1:])
        except ValueError:
            continue
        if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), _MANIFEST)):
            out[n] = st.getPath()
    return out


def _read_manifest(jvm, fs, vdir) -> dict:
    from spark_jdbc_limit_spark.sinks.transactional import _fs_read_text

    return json.loads(
        _fs_read_text(jvm, fs, jvm.org.apache.hadoop.fs.Path(vdir, _MANIFEST))
    )


def write_snapshot(
    df: DataFrame, table: str, mode: str = "overwrite", meta: dict | None = None
) -> int:
    """Commit ``df`` as a new snapshot of ``table``; returns its version.

    ``overwrite`` → the snapshot is exactly ``df``. ``append`` → the
    snapshot is the parent snapshot plus ``df`` (zero-copy: parent files
    are referenced, not rewritten). ``meta`` rides in the manifest —
    writers use it for idempotence markers (e.g. streaming epoch ids).
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    spark = df.sparkSession
    jvm, fs, table_path = _hadoop_fs(spark, table)
    Path = jvm.org.apache.hadoop.fs.Path
    committed = _list_committed(jvm, fs, table_path)
    parent = max(committed) if committed else 0
    version = parent + 1
    vdir = f"{table.rstrip('/')}/v{version}"

    inherited: list[str] = []
    if mode == "append" and parent:
        inherited = _read_manifest(jvm, fs, committed[parent])["files"]

    try:
        df.write.mode("overwrite").parquet(vdir)
    except Exception as exc:
        fs.delete(Path(vdir), True)  # manifest-less dir would be inert, but be tidy
        raise AtomicWriteError(
            f"snapshot data write to {vdir} failed; table still at v{parent}"
        ) from exc
    own = [
        f"v{version}/{st.getPath().getName()}"
        for st in fs.listStatus(Path(vdir))
        if st.getPath().getName().endswith(".parquet")
    ]
    manifest = {
        "version": version,
        "parent": parent or None,
        "mode": mode,
        "files": inherited + own,
        "meta": meta or {},
    }
    from spark_jdbc_limit_spark.sinks.transactional import _fs_write_text

    tmp = Path(vdir, _MANIFEST + ".tmp")
    _fs_write_text(fs, tmp, json.dumps(manifest))
    if not fs.rename(tmp, Path(vdir, _MANIFEST)):  # COMMIT POINT
        fs.delete(Path(vdir), True)
        raise AtomicWriteError(f"commit rename failed for {vdir}; table still at v{parent}")
    return version


def list_versions(spark: SparkSession, table: str) -> list[int]:
    jvm, fs, table_path = _hadoop_fs(spark, table)
    return sorted(_list_committed(jvm, fs, table_path))


def read_snapshot(spark: SparkSession, table: str, version: int | None = None) -> DataFrame:
    """Read a committed snapshot (default: the latest)."""
    jvm, fs, table_path = _hadoop_fs(spark, table)
    committed = _list_committed(jvm, fs, table_path)
    if not committed:
        raise AtomicWriteError(f"{table} has no committed snapshots")
    if version is None:
        version = max(committed)
    if version not in committed:
        raise AtomicWriteError(
            f"{table} has no committed v{version}; versions: {sorted(committed)}"
        )
    files = _read_manifest(jvm, fs, committed[version])["files"]
    root = table.rstrip("/")
    return spark.read.parquet(*[posixpath.join(root, f) for f in files])


def vacuum(spark: SparkSession, table: str, retain_last: int = 2) -> dict:
    """Drop snapshots beyond the ``retain_last`` newest, keeping every
    data file a retained manifest still references; sweep manifest-less
    (crashed/uncommitted) version dirs. Returns a summary dict."""
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    jvm, fs, table_path = _hadoop_fs(spark, table)
    Path = jvm.org.apache.hadoop.fs.Path
    committed = _list_committed(jvm, fs, table_path)
    keep = set(sorted(committed)[-retain_last:])
    referenced: set[str] = set()
    for v in keep:
        referenced |= set(_read_manifest(jvm, fs, committed[v])["files"])
    dropped_versions: list[int] = []
    dropped_files = swept_dirs = 0
    for v, vdir in committed.items():
        if v in keep:
            continue
        # delete only files no retained manifest references; the dir
        # survives (manifest removed) if any of its files are inherited
        survivors = False
        for st in fs.listStatus(vdir):
            name = st.getPath().getName()
            rel = f"v{v}/{name}"
            if name == _MANIFEST:
                continue
            if rel in referenced:
                survivors = True
            elif name.endswith(".parquet"):
                fs.delete(st.getPath(), False)
                dropped_files += 1
        fs.delete(Path(vdir, _MANIFEST), False)
        if not survivors:
            fs.delete(vdir, True)
        dropped_versions.append(v)
    # uncommitted orphans (no manifest): crashed writers — inert to
    # readers, reclaim the space. Single-writer assumption, as documented.
    if fs.exists(table_path):
        for st in fs.listStatus(table_path):
            name = st.getPath().getName()
            if (
                st.isDirectory()
                and name.startswith("v")
                and name[1:].isdigit()
                and int(name[1:]) not in committed
            ):
                fs.delete(st.getPath(), True)
                swept_dirs += 1
    return {
        "dropped_versions": sorted(dropped_versions),
        "dropped_files": dropped_files,
        "swept_uncommitted_dirs": swept_dirs,
        "retained": sorted(keep),
    }


def read_incremental(
    spark: SparkSession, table: str, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Rows ADDED between two snapshots: the files in ``to_version``'s
    manifest that ``from_version``'s manifest does not reference —
    pure manifest diff, no data comparison, no re-read of the base.

    This is the incremental-consumption leg of the snapshot store: a
    downstream job that processed v_k resumes by reading exactly the
    delta files of v_k+1..v_n (appends are consumed natively; an
    OVERWRITE in the range makes "added rows" ill-defined for the whole
    range, so it raises — the consumer must re-baseline, which is also
    what Delta/Iceberg CDC requires without a changelog).
    """
    jvm, fs, table_path = _hadoop_fs(spark, table)
    committed = _list_committed(jvm, fs, table_path)
    if to_version is None:
        to_version = max(committed) if committed else 0
    for v in (from_version, to_version):
        if v not in committed:
            raise AtomicWriteError(
                f"{table} has no committed v{v}; versions: {sorted(committed)}"
            )
    if to_version < from_version:
        raise ValueError(f"to_version {to_version} < from_version {from_version}")
    for v in range(from_version + 1, to_version + 1):
        if v in committed and _read_manifest(jvm, fs, committed[v])["mode"] != "append":
            raise AtomicWriteError(
                f"v{v} is an overwrite: incremental reads across it are "
                "ill-defined; re-baseline from read_snapshot"
            )
    base = set(_read_manifest(jvm, fs, committed[from_version])["files"])
    head = _read_manifest(jvm, fs, committed[to_version])["files"]
    delta = [f for f in head if f not in base]
    root = table.rstrip("/")
    if not delta:
        return read_snapshot(spark, table, to_version).limit(0)
    return spark.read.parquet(*[posixpath.join(root, f) for f in delta])


def merge_snapshot(updates: DataFrame, table: str, key_cols: list[str]) -> int:
    """Copy-on-write upsert: commit a new snapshot equal to the latest
    snapshot with ``updates`` rows replacing any existing row sharing the
    same key (and new keys appended) — MERGE INTO semantics without a
    table format.

    Shape: latest LEFT ANTI updates (one shuffle join on the key — the
    same plan MERGE compiles to) unioned with updates, committed through
    the ordinary overwrite protocol. Copy-on-write rewrites the full
    snapshot, which is the correct default for bulk upserts; the
    file-pruned variant (rewrite only files containing touched keys) is
    the Delta/Iceberg optimization this layout supports but does not
    implement. Updates must carry the full schema of the table.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    spark = updates.sparkSession
    current = read_snapshot(spark, table)
    if set(current.columns) != set(updates.columns):
        raise AtomicWriteError(
            f"merge schema mismatch: table {sorted(current.columns)} vs "
            f"updates {sorted(updates.columns)}"
        )
    survivors = current.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = survivors.select(*current.columns).unionByName(
        updates.select(*current.columns)
    )
    return write_snapshot(merged, table, "overwrite")


def snapshot_manifest(spark: SparkSession, table: str, version: int | None = None) -> dict:
    """The committed manifest of a snapshot (latest by default)."""
    jvm, fs, table_path = _hadoop_fs(spark, table)
    committed = _list_committed(jvm, fs, table_path)
    if not committed:
        raise AtomicWriteError(f"{table} has no committed snapshots")
    if version is None:
        version = max(committed)
    if version not in committed:
        raise AtomicWriteError(f"{table} has no committed v{version}")
    return _read_manifest(jvm, fs, committed[version])


def append_snapshot_epoch(batch_df: DataFrame, table: str, epoch_id: int) -> int | None:
    """Idempotently append one streaming micro-batch as a snapshot.

    foreachBatch MAY replay an epoch after a crash between the sink
    commit and the checkpoint commit; the epoch id recorded in the
    manifest makes the replay a no-op — exactly-once OUTPUT from
    at-least-once delivery, the standard epoch-keyed idempotent-sink
    contract. Returns the committed version, or None when skipped."""
    spark = batch_df.sparkSession
    jvm, fs, table_path = _hadoop_fs(spark, table)
    committed = _list_committed(jvm, fs, table_path)
    if committed:
        last = _read_manifest(jvm, fs, committed[max(committed)])
        last_epoch = last.get("meta", {}).get("epoch")
        if last_epoch is not None and last_epoch >= epoch_id:
            return None  # replayed epoch — already committed
    if batch_df.isEmpty():
        return None
    return write_snapshot(batch_df, table, "append", meta={"epoch": epoch_id})


def run_stream_snapshot_appends(stream_df: DataFrame, table: str, checkpoint: str) -> None:
    """Drive a (finite) stream into the snapshot store: each micro-batch
    commits one append version, so the table is simultaneously the live
    sink AND a time-travelable history of every batch boundary — and
    ``read_incremental`` hands downstream consumers exactly the new rows
    of any epoch range. Exactly-once end to end: source offsets live in
    the checkpoint, output idempotence in the manifest epoch ids."""

    def publish(batch_df: DataFrame, epoch_id: int) -> None:
        append_snapshot_epoch(batch_df, table, epoch_id)

    q = (
        stream_df.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
