"""Minimal versioned-table layer: an append-only JSON commit log over
plain parquet files, giving atomic commits, time travel, and an
auditable history — the core mechanics (in miniature, file-listing
based) that table formats like Delta Lake / Iceberg provide at object-
store scale (public designs). The reference rewrites shard directories
in place (`DPF/processors/writers/shards_writer.py`) with no history;
a 100 TB corpus shared across teams needs "read exactly the snapshot
release 41 was trained on" as a first-class operation.

Layout::

    <path>/_log/00000000.json   one manifest per version:
                                {"version", "mode", "rows", "files"}
    <path>/data/v0_<uuid>/...   immutable parquet written per commit

Commit protocol: data files are written first (immutable, never
rewritten), then the manifest is written to a temp name and RENAMED to
``_log/{version:08d}.json`` — the rename is the commit point, so a
reader either sees a complete version or the previous one. Renames are
atomic on HDFS/posix; on S3 use a pointer object instead (documented,
as in atomic_publish). Concurrent writers are last-rename-wins; this
layer does not implement optimistic locking.

Readers never list ``data/`` — the manifest is the source of truth, so
stray files from failed commits are invisible (and can be vacuumed by
comparing the listing against all manifests).
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )


def _read_manifest(spark: SparkSession, path: str, version: int) -> dict:
    jvm, fs = _fs(spark, path)
    mp = jvm.org.apache.hadoop.fs.Path(f"{path}/_log/{version:08d}.json")
    if not fs.exists(mp):
        raise FileNotFoundError(f"version {version} not found under {path}")
    stream = fs.open(mp)
    try:
        # stream-level byte copy (ByteBuffer reads are unsupported on
        # some Hadoop FS impls, e.g. the local ChecksumFileSystem)
        raw = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return json.loads(bytes(raw).decode("utf-8"))
    finally:
        stream.close()


def _list_versions(spark: SparkSession, path: str) -> list[int]:
    """Versions whose manifests actually EXIST, ascending — one
    ``_log`` listing. Never assume a contiguous 0..latest range:
    vacuum() deletes old manifests, so iterating a range would crash
    on the first vacuumed version."""
    jvm, fs = _fs(spark, path)
    log = jvm.org.apache.hadoop.fs.Path(f"{path}/_log")
    if not fs.exists(log):
        return []
    versions = []
    for st in fs.listStatus(log):
        name = st.getPath().getName()
        if name.endswith(".json") and not name.startswith("."):
            try:
                versions.append(int(name[:-5]))
            except ValueError:
                continue
    return sorted(versions)


def latest_version(spark: SparkSession, path: str) -> int | None:
    """Highest committed version, or None for an empty/absent table."""
    versions = _list_versions(spark, path)
    return versions[-1] if versions else None


def commit(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "append",
    tag: str | None = None,
) -> int:
    """Commit ``df`` as a new version of the table at ``path``.

    ``mode='append'`` adds the new files to the previous manifest;
    ``mode='overwrite'`` starts the manifest fresh (old files stay on
    disk for time travel — this is versioning, not deletion). Returns
    the committed version number. The manifest rename is the atomic
    commit point; a crash before it leaves only invisible data files.

    ``tag`` (e.g. a streaming batch id) is recorded in the manifest
    and deduplicated: committing a tag the table has already seen is a
    NO-OP returning that version — the idempotence hook that makes
    foreachBatch replays exactly-once. The full {tag: version} index
    is carried forward in every manifest, so the check reads ONE
    manifest (O(1) per micro-batch, not O(versions)) and survives
    vacuum() deleting the manifest that first recorded the tag.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be 'append' or 'overwrite'")
    prev = latest_version(spark, path)
    tags: dict[str, int] = {}
    if prev is not None:
        pm_prev = _read_manifest(spark, path, prev)
        if "tags" in pm_prev:
            tags = dict(pm_prev["tags"])
        else:
            # pre-index manifests: rebuild from those that still exist
            for v in _list_versions(spark, path):
                t = _read_manifest(spark, path, v).get("tag")
                if t is not None:
                    tags.setdefault(t, v)
    if tag is not None and tag in tags:
        return tags[tag]
    version = 0 if prev is None else prev + 1
    if tag is not None:
        tags[tag] = version
    data_dir = f"{path}/data/v{version}_{uuid.uuid4().hex[:8]}"
    df.write.parquet(data_dir)

    jvm, fs = _fs(spark, path)
    new_files = []
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(data_dir)):
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            new_files.append(str(st.getPath().toString()))
    rows = spark.read.parquet(*new_files).count()
    files = list(new_files)
    total = rows
    if mode == "append" and prev is not None:
        pm = _read_manifest(spark, path, prev)
        files = pm["files"] + files
        total = pm["rows"] + rows

    manifest = {
        "version": version,
        "mode": mode,
        "rows": total,
        "files": sorted(files),
        "tag": tag,
        "tags": tags,
    }
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{path}/_log/.tmp_{uuid.uuid4().hex[:8]}.json"
    )
    final = jvm.org.apache.hadoop.fs.Path(f"{path}/_log/{version:08d}.json")
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(f"{path}/_log"))
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(tmp, final):
        fs.delete(tmp, False)
        raise IOError(
            f"commit of version {version} lost a rename race at {path}"
        )
    return version


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table AS OF ``version`` (default: latest). Time travel
    is just reading an older manifest's file list — old versions stay
    readable until explicitly vacuumed."""
    if version is None:
        version = latest_version(spark, path)
        if version is None:
            raise FileNotFoundError(f"no committed versions under {path}")
    m = _read_manifest(spark, path, version)
    return spark.read.parquet(*m["files"])


def history(spark: SparkSession, path: str) -> list[dict]:
    """All RETAINED manifests (version, mode, rows, n_files), oldest
    first — versions whose manifests vacuum() has deleted are absent,
    not an error."""
    out = []
    for v in _list_versions(spark, path):
        m = _read_manifest(spark, path, v)
        out.append(
            {
                "version": m["version"],
                "mode": m["mode"],
                "rows": m["rows"],
                "n_files": len(m["files"]),
            }
        )
    return out


def read_changes(
    spark: SparkSession, path: str, from_version: int, to_version: int
) -> DataFrame:
    """Rows ADDED between two versions: read only the files present in
    ``to_version``'s manifest but not in ``from_version``'s — the
    incremental-consumption primitive (a downstream pipeline processes
    each release's delta instead of rescanning the table). For an
    overwrite commit the whole new manifest is the delta (files are
    never reused across an overwrite). Raises on an empty delta.
    """
    if to_version <= from_version:
        raise ValueError("to_version must be > from_version")
    old = set(_read_manifest(spark, path, from_version)["files"])
    new = _read_manifest(spark, path, to_version)["files"]
    added = [f for f in new if f not in old]
    if not added:
        raise ValueError(
            f"no files added between v{from_version} and v{to_version}"
        )
    return spark.read.parquet(*added)


def vacuum(spark: SparkSession, path: str, keep_versions: int = 1) -> int:
    """Delete data files not referenced by any of the newest
    ``keep_versions`` manifests (and drop the older manifests), plus
    stray files from failed commits. Returns the number of deleted
    data directories/files. After vacuum, time travel reaches only the
    kept versions — the storage-reclaim half of the versioning
    contract, split from commit() so retention is an explicit
    operational decision.
    """
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    versions = _list_versions(spark, path)
    if not versions:
        return 0
    last = versions[-1]
    keep_from = max(0, last - keep_versions + 1)
    referenced: set[str] = set()
    # only retained manifests — a prior vacuum with a smaller window
    # may have deleted some versions inside this one's keep range
    for v in versions:
        if v >= keep_from:
            referenced.update(_read_manifest(spark, path, v)["files"])
    jvm, fs = _fs(spark, path)
    deleted = 0
    data = jvm.org.apache.hadoop.fs.Path(f"{path}/data")
    if fs.exists(data):
        it = fs.listFiles(data, True)
        while it.hasNext():
            st = it.next()
            f = str(st.getPath().toString())
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue
            if f.endswith(".parquet") and f not in referenced:
                fs.delete(st.getPath(), False)
                deleted += 1
    for v in versions:
        if v < keep_from:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{path}/_log/{v:08d}.json"),
                False,
            )
    return deleted
