"""Snapshot-versioned parquet table layer: atomic commits, time travel,
and an exact change feed — the manifest pattern behind every modern table
format, in ~150 lines over the Hadoop FileSystem API.

Why manifests and not directory listing at 100 TB:

- **Atomic commits.** Readers resolve a version by reading ONE manifest
  file; a writer stages data files first and creates the manifest last
  (``create(overwrite=False)``), so a crash mid-write leaves orphan data
  files but never a half-visible version, and two writers racing on the
  same version number fail cleanly (optimistic concurrency) instead of
  corrupting the table.
- **Listing-free scans.** An object-store LIST over millions of files is
  slow and (historically) eventually consistent; the manifest pins the
  exact file set, so a scan plans from a KB of JSON.
- **Time travel.** Old manifests keep old versions readable until a
  retention job deletes them — the reproducibility contract a training
  pipeline needs ("which exact corpus built this checkpoint?").

All IO goes through the Hadoop FileSystem API, so ``file://``, ``hdfs://``
and ``s3a://`` layers largely behave identically (same portability
contract as ``sinks.layer_parquet_bytes``).  Commit atomicity is
substrate-specific, and documented rather than over-claimed:

- The manifest is staged at a temp name and **renamed** into place, so a
  racing reader can never observe a truncated manifest (a bare
  ``create()`` is visible on HDFS before its bytes land).
- HDFS rename fails when the destination exists, which doubles as the
  optimistic-concurrency lock.  The local FS ``rename(2)`` would
  overwrite, so an existence check front-runs the rename there (the
  single-JVM test substrate — the residual check-then-rename window is a
  same-process race only).
- **S3 has no atomic no-overwrite primitive at all** (S3A ``create``
  /``rename`` are both check-then-write): a real S3 deployment needs an
  external lock or conditional PUT, exactly as Delta's ``LogStore``
  contract requires.  This layer does not claim otherwise.

No counterpart in the reference (its "versioning" is overwriting one
PostgreSQL table, publish.py:102-167); this generalizes S4's re-create
semantics into something auditable.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from ..operators.materialize import materialize

_MANIFEST_DIR = "_manifests"


class InProcessCommitLock:
    """Default commit-lock provider: a process-wide ``threading.Lock``
    serializing the exists-check + rename commit point against
    concurrent writer THREADS sharing this SparkSession (the
    single-JVM substrate — e.g. racing ``foreachBatch`` sinks).  Two
    *processes* racing on a local FS are not covered; see
    ``FileCommitLock``."""

    def __init__(self) -> None:
        self._lock = threading.Lock()

    def acquire(self, spark: SparkSession, path: str):
        import contextlib

        @contextlib.contextmanager
        def _ctx():
            with self._lock:
                yield

        return _ctx()


class FileCommitLock:
    """Commit-lock provider for CROSS-PROCESS writers on a shared
    filesystem: the lock is an exclusive marker file created with
    ``FileSystem.createNewFile`` (atomic ``O_CREAT|O_EXCL`` on POSIX
    local FS; atomic namenode op on HDFS) next to the destination.
    A holder that crashed is broken after ``stale_seconds`` via the
    marker's mtime.  On S3 neither create-exclusive nor rename is
    atomic — a real deployment implements this interface with a
    conditional PUT or an external lock table (Delta's ``LogStore``
    contract); this class is the seam where that plugs in."""

    def __init__(
        self,
        *,
        timeout_seconds: float = 30.0,
        stale_seconds: float = 60.0,
        poll_seconds: float = 0.01,
    ) -> None:
        self.timeout_seconds = timeout_seconds
        self.stale_seconds = stale_seconds
        self.poll_seconds = poll_seconds

    @staticmethod
    def _try_create(fs, lock, local: str | None) -> bool:
        """One exclusive-create attempt.  LOCAL paths go through
        ``os.open(O_CREAT|O_EXCL)`` — the POSIX-atomic primitive —
        because Hadoop's base ``FileSystem.createNewFile`` is
        exists-check-then-create and its local ``create(overwrite=
        False)`` re-checks non-atomically (two PROCESSES could both
        win).  On HDFS ``create(overwrite=false)`` is a single atomic
        namenode op, so ``createNewFile`` is safe there: the loser's
        create throws and reads as not-acquired."""
        if local is not None:
            import os

            try:
                os.close(
                    os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                )
                return True
            except FileExistsError:
                return False
            except OSError:
                return False
        try:
            return bool(fs.createNewFile(lock))
        except Exception:
            return False

    def acquire(self, spark: SparkSession, path: str):
        import contextlib

        jvm, fs = _fs(spark, path)
        lock_path = f"{path}.lock"
        lock = _hpath(jvm, lock_path)
        stripped = lock_path.removeprefix("file:")
        local = stripped if stripped.startswith("/") else None

        @contextlib.contextmanager
        def _ctx():
            deadline = time.time() + self.timeout_seconds
            while True:
                if self._try_create(fs, lock, local):
                    break
                try:
                    st = fs.getFileStatus(lock)
                    age_ms = time.time() * 1000.0 - st.getModificationTime()
                    if age_ms > self.stale_seconds * 1000.0:
                        # break a crashed holder by ATOMIC RENAME, not
                        # delete: with a blind delete two waiters could
                        # both judge the same lock stale and the slower
                        # one would remove the faster one's FRESH
                        # replacement, letting two processes into the
                        # critical section.  rename-to-unique succeeds
                        # for exactly one stealer (the source vanishes
                        # for everyone else), who removes the corpse
                        # and retries create like any other waiter.
                        corpse = _hpath(
                            jvm, f"{path}.lock.stale-{uuid.uuid4().hex[:8]}"
                        )
                        if fs.rename(lock, corpse):
                            fs.delete(corpse, False)
                        continue
                except Exception:
                    pass  # lock vanished between create and stat: retry
                if time.time() > deadline:
                    raise TimeoutError(
                        f"commit lock {lock} not acquired within "
                        f"{self.timeout_seconds}s"
                    )
                time.sleep(self.poll_seconds)
            try:
                yield
            finally:
                fs.delete(lock, False)

        return _ctx()


# the active provider serializing _write_text's commit point; swap with
# set_commit_lock_provider for object-store / multi-process semantics
_COMMIT_LOCK = InProcessCommitLock()


def set_commit_lock_provider(provider) -> object:
    """Install a commit-lock provider (an object with
    ``acquire(spark, path) -> context manager``); returns the previous
    one so tests/deployments can restore it."""
    global _COMMIT_LOCK
    prev = _COMMIT_LOCK
    _COMMIT_LOCK = provider
    return prev

# staging dirs are data/v{N}-{token}; bare data/v{N} (the pre-uuid layout)
# still parses so old layers stay readable
_STAGE_RE = re.compile(r"^v(\d+)(?:-[0-9a-f]+)?$")


def _fs(spark: SparkSession, path: str):
    """(jvm, FileSystem) for ``path`` — the FileSystem handle is cached
    per (SparkContext, scheme, authority): Hadoop FileSystems are
    singletons per scheme AND authority (``hdfs://nn1`` vs ``hdfs://nn2``,
    two ``s3a://`` buckets), so a scheme-only key would hand authority A's
    handle to authority B and every call would fail with Hadoop's
    "Wrong FS" (ADVICE r15).  Re-resolving per call only paid 2-3 py4j
    round-trips, but metadata-heavy sweeps make thousands of ``_fs``
    calls (r15 measured ~3.3k gateway round-trips per catalog
    maintenance sweep, the latency amplifier whenever the JVM is busy)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    if "://" in path:
        scheme, rest = path.split("://", 1)
        key = (scheme, rest.split("/", 1)[0])
    else:
        key = ("", "")
    cache = getattr(sc, "_aie321_fs_cache", None)
    if cache is None:
        cache = {}
        sc._aie321_fs_cache = cache
    fs = cache.get(key)
    if fs is None:
        fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
            sc._jsc.hadoopConfiguration()
        )
        cache[key] = fs
    return jvm, fs


def _hpath(jvm, path: str):
    return jvm.org.apache.hadoop.fs.Path(path)


def _local_path(spark: SparkSession, path: str) -> str | None:
    """The POSIX path for ``path`` when it provably resolves to the
    LOCAL filesystem, else None.  ``file:``-prefixed paths are local by
    definition; schemeless paths are local only when the cluster's
    ``fs.defaultFS`` is ``file`` (on YARN/HDFS a schemeless path means
    HDFS — those keep the Hadoop FS round-trips).  Metadata-heavy
    planning makes thousands of tiny stat/list/read calls per sweep;
    serving them through ``os`` instead of py4j removes the gateway
    latency amplification entirely on local substrates (r15)."""
    if path.startswith("file:"):
        rest = path.removeprefix("file:")
        if rest.startswith("//"):
            # file://AUTHORITY/path — a non-empty, non-localhost authority
            # names a remote host: NOT provably local, keep the Hadoop
            # path (ADVICE r15: '//host/p' must not be opened as a POSIX
            # path, where a leading '//' is implementation-defined)
            tail = rest[2:]
            cut = tail.find("/")
            authority = tail if cut < 0 else tail[:cut]
            if authority and authority != "localhost":
                return None
            rest = "/" if cut < 0 else tail[cut:]
        return rest
    if "://" in path:
        return None
    sc = spark.sparkContext
    default = getattr(sc, "_aie321_default_fs", None)
    if default is None:
        default = (
            sc._jsc.hadoopConfiguration().get("fs.defaultFS") or "file:///"
        )
        sc._aie321_default_fs = default
    return path if default.startswith("file") else None


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    """Commit ``text`` at ``path`` via stage-then-rename; fails with
    ``FileExistsError`` if ``path`` already exists (the commit point —
    rename-no-overwrite is the optimistic lock).

    Staging the bytes at a temp name first means no reader can ever open
    a half-written manifest: the destination either does not exist or
    holds the complete file.  On HDFS the rename itself refuses an
    existing destination (atomic lock); the local FS overwrites on
    rename, so the existence checks carry the lock there.  On S3 neither
    is atomic — see the module docstring."""
    jvm, fs = _fs(spark, path)
    dst = _hpath(jvm, path)
    if fs.exists(dst):
        raise FileExistsError(f"concurrent commit: {path} already exists")
    tmp_path = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    tmp = _hpath(jvm, tmp_path)
    out = fs.create(tmp, False)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    # the local-FS rename(2) OVERWRITES an existing destination, so the
    # exists-check-then-rename pair must run under the COMMIT LOCK: the
    # default in-process provider covers threads sharing this
    # SparkSession (e.g. concurrent foreachBatch sinks); FileCommitLock
    # extends the guarantee across processes on a shared POSIX FS /
    # HDFS; an S3 deployment plugs a conditional-PUT provider into the
    # same seam (set_commit_lock_provider — the LogStore contract)
    with _COMMIT_LOCK.acquire(spark, path):
        if fs.exists(dst) or not fs.rename(tmp, dst):
            fs.delete(tmp, False)
            raise FileExistsError(
                f"concurrent commit: lost the race on {path}"
            )


def _read_text(spark: SparkSession, path: str) -> str:
    lp = _local_path(spark, path)
    if lp is not None:
        # plain open(): missing files raise FileNotFoundError just like
        # the Hadoop stream raises — callers treat both identically
        with open(lp, encoding="utf-8") as fh:
            return fh.read()
    jvm, fs = _fs(spark, path)
    stream = fs.open(_hpath(jvm, path))
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _list_parquet_files(spark: SparkSession, path: str) -> list[str]:
    jvm, fs = _fs(spark, path)
    it = fs.listFiles(_hpath(jvm, path), True)
    files = []
    while it.hasNext():
        p = it.next().getPath()
        if p.getName().endswith(".parquet"):
            files.append(p.toString())
    return sorted(files)


def _list_parquet_sizes(spark: SparkSession, path: str) -> dict[str, int]:
    """Basename -> byte size for the parquet files under ``path`` (one
    recursive listing; the commit-time source of the manifest's ``sizes``
    map, which is what lets compaction and broadcast-size estimation run
    without per-file RPCs later)."""
    jvm, fs = _fs(spark, path)
    it = fs.listFiles(_hpath(jvm, path), True)
    sizes: dict[str, int] = {}
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        if p.getName().endswith(".parquet"):
            sizes[p.getName()] = int(st.getLen())
    return sizes


def _logical_size_expr(schema: T.StructType):
    """Per-row LOGICAL byte size expression: fixed widths for numeric/
    temporal columns, octet length + pointer overhead for variable ones
    (nested types via their JSON rendering), + 8 bytes row overhead.
    This approximates the IN-MEMORY footprint a row has on the build
    side of a broadcast — the figure that matters for fits-in-memory
    decisions.  Parquet's own footer "uncompressed" size is NOT this:
    it measures encoded (dictionary/RLE) pages, so a column of one
    repeated string looks tiny there while costing full width in a
    hash relation."""
    total = F.lit(8)
    for f in schema.fields:
        t = f.dataType
        if isinstance(
            t,
            (
                T.LongType,
                T.DoubleType,
                T.TimestampType,
                T.TimestampNTZType,
            ),
        ):
            total = total + F.lit(8)
        elif isinstance(t, (T.IntegerType, T.FloatType, T.DateType)):
            total = total + F.lit(4)
        elif isinstance(t, T.ShortType):
            total = total + F.lit(2)
        elif isinstance(t, (T.ByteType, T.BooleanType)):
            total = total + F.lit(1)
        elif isinstance(t, T.DecimalType):
            total = total + F.lit(16)
        elif isinstance(t, (T.StringType, T.BinaryType)):
            total = (
                total
                + F.coalesce(F.octet_length(F.col(f.name)), F.lit(0))
                + F.lit(20)
            )
        else:
            total = (
                total
                + F.coalesce(
                    F.octet_length(F.to_json(F.col(f.name))), F.lit(0)
                )
                + F.lit(20)
            )
    return total


def snapshot_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed versions of the layer at ``path``, ascending."""
    lp = _local_path(spark, path)
    if lp is not None:
        try:
            names = os.listdir(os.path.join(lp, _MANIFEST_DIR))
        except FileNotFoundError:
            return []
        return sorted(
            int(n[1:-5])
            for n in names
            if n.startswith("v") and n.endswith(".json")
        )
    jvm, fs = _fs(spark, path)
    mdir = _hpath(jvm, f"{path}/{_MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    versions = []
    for status in fs.listStatus(mdir):
        name = status.getPath().getName()  # v{N}.json
        if name.startswith("v") and name.endswith(".json"):
            versions.append(int(name[1:-5]))
    return sorted(versions)


# ---------------------------------------------------------------------------
# Segmented manifests (format 2) — Iceberg's manifest-list idea.
#
# A format-1 manifest inlines every live data file with its stats into ONE
# JSON document, so read planning parses O(all files ever) on the driver:
# at 100 TB (10^6-10^7 files) that is a multi-GB parse per query — the one
# real scale-killer in a single-document design.  Format 2 instead stores
# the per-file maps (files / stats / counts / blooms / sizes) in immutable
# SEGMENT files under ``_manifests/segments/``, and the version manifest
# carries only one small entry per segment: path, file/row/byte totals,
# and per-column [min, max] aggregated over the segment's files.  The
# consequences, each load-bearing at scale:
#
# - **Planning is O(pruned segments).** ``snapshot_files(prune_range=...)``
#   drops whole segments on the entry-level [min, max] before reading a
#   single segment file; only surviving segments are loaded for file-level
#   skipping.  A range-clustered layer answers a narrow scan by parsing a
#   handful of KB-sized JSONs, however many files the table has.
# - **Appends write O(delta) manifest bytes.** An append carries the head's
#   segment entries BY REFERENCE and writes new segment(s) for the new
#   files only — where format 1 re-serialized the whole file inventory on
#   every commit.
# - **COUNT(*) is entry-arithmetic.** Per-segment n_rows makes
#   ``snapshot_row_count`` a zero-segment-read fold.
#
# Segments are immutable and content-addressed (version + random token in
# the name), so carrying an entry by reference is always safe; vacuum GCs
# segment files no surviving manifest references, with the same in-flight
# grace window as data staging dirs.  Format-1 manifests remain fully
# readable; the first mutating commit migrates them by packing the inline
# maps into segments (one-time O(head files) metadata write, zero data IO).
# ---------------------------------------------------------------------------

_SEGMENT_MAX_FILES = 256

# observability hook: tests assert planning cost is O(pruned segments) by
# counting actual segment-file reads
_SEGMENT_READS = {"n": 0}


#: (file path) -> ((mtime, length), parsed dict): manifest and segment
#: files are WRITE-ONCE at a path (``_write_text`` refuses overwrite),
#: so a parsed copy validated against the file's (mtime, length)
#: signature is safe to reuse — one getFileStatus py4j call replaces
#: the open/read/close round-trips plus the JSON parse.  A vacuumed
#: file fails the status call (natural miss — reads of vacuumed
#: versions still fail, the pyds refuse-on-vacuumed contract); a
#: drop + recreate at the same path changes the signature AND the
#: drop-layer hook purges eagerly.  Entries are deep-copied out
#: because ``_manifest`` materializes segment maps INTO the dict it
#: gets back.
_JSON_FILE_CACHE: dict[str, tuple[tuple[int, int], dict]] = {}


def _read_json_cached(
    spark: SparkSession, path: str, *, copy_out: bool = True
) -> dict:
    import copy

    lp = _local_path(spark, path)
    if lp is not None:
        st = os.stat(lp)  # missing file raises, exactly like getFileStatus
        sig = (int(st.st_mtime * 1000), int(st.st_size))
    else:
        jvm, fs = _fs(spark, path)
        jst = fs.getFileStatus(_hpath(jvm, path))
        sig = (int(jst.getModificationTime()), int(jst.getLen()))
    hit = _JSON_FILE_CACHE.get(path)
    if hit is None or hit[0] != sig:
        _JSON_FILE_CACHE[path] = (sig, json.loads(_read_text(spark, path)))
    if not copy_out:
        # read-only fast path (segments): every consumer only iterates /
        # .update()s FROM the maps, and segment bloom-bit lists run to
        # thousands of ints per file — deep-copying them per consulted
        # segment was the advisor sweep's dominant driver CPU (r15).
        # MappingProxyType trips top-level mutation attempts loudly.
        from types import MappingProxyType

        return MappingProxyType(_JSON_FILE_CACHE[path][1])
    return copy.deepcopy(_JSON_FILE_CACHE[path][1])


def _evict_json_cache(path: str) -> None:
    pfx = path.rstrip("/") + "/"
    for key in [
        k for k in _JSON_FILE_CACHE if k == path or k.startswith(pfx)
    ]:
        del _JSON_FILE_CACHE[key]


def _manifest_raw(spark: SparkSession, path: str, version: int) -> dict:
    """The version manifest EXACTLY as written — for format 2 the
    per-file maps live in segment files and are NOT loaded.  Planning
    paths work from this plus only the segments they need."""
    return _read_json_cached(
        spark, f"{path}/{_MANIFEST_DIR}/v{version}.json"
    )


def _read_segment(spark: SparkSession, seg_path: str) -> dict:
    # counts segments CONSULTED (the plan-cost pin tests rely on), not
    # physical reads — the signature-validated cache may serve the bytes.
    # Segments are served WITHOUT a defensive copy (read-only contract —
    # see _read_json_cached): only _manifest mutates what it reads, and
    # it mutates the MANIFEST dict, never a segment.
    _SEGMENT_READS["n"] += 1
    return _read_json_cached(spark, seg_path, copy_out=False)


def _manifest(spark: SparkSession, path: str, version: int) -> dict:
    """MATERIALIZED view of one version's manifest: for segmented
    manifests the per-file maps (files/stats/counts/blooms/sizes) are
    loaded from ALL segment files and inlined — the compatibility path
    for maintenance jobs and tests that want the full inventory.  Hot
    paths (snapshot_files, row_count, merge, append delta) must NOT use
    this; they stay O(relevant segments) via ``_manifest_raw``."""
    m = _manifest_raw(spark, path, version)
    if m.get("format", 1) < 2:
        return m
    files: list[str] = []
    stats: dict = {}
    counts: dict = {}
    blooms: dict = {}
    sizes: dict = {}
    raw_sizes: dict = {}
    colmeta: dict = {}
    for entry in m.get("segments") or []:
        seg = _read_segment(spark, entry["path"])
        files.extend(seg["files"])
        stats.update(seg.get("stats") or {})
        counts.update(seg.get("counts") or {})
        blooms.update(seg.get("blooms") or {})
        sizes.update(seg.get("sizes") or {})
        raw_sizes.update(seg.get("raw_sizes") or {})
        colmeta.update(seg.get("colmeta") or {})
    m["files"] = sorted(files)
    m["stats"] = stats
    m["counts"] = counts
    m["blooms"] = blooms
    m["sizes"] = sizes
    m["raw_sizes"] = raw_sizes
    m["colmeta"] = colmeta
    return m


def _aggregate_seg_stats(bases: list[str], seg_stats: dict) -> dict:
    """Per-SEGMENT [min, max] per column for the version manifest's
    segment entry.  A column appears ONLY when every member file has a
    recorded stats entry for it (absence = 'cannot skip safely', the
    same conservative contract as per-file stats); ``[None, None]``
    means recorded-but-empty (all member files zero-row / all-NULL) —
    safe to skip under the NULL-rejecting prune contract."""
    if not bases or any(b not in seg_stats for b in bases):
        return {}
    cols = set(seg_stats[bases[0]])
    for b in bases[1:]:
        cols &= set(seg_stats[b])
    out: dict = {}
    for c in sorted(cols):
        lo = hi = None
        for b in bases:
            s = seg_stats[b][c]
            if s[0] is None or s[1] is None:
                continue
            lo = s[0] if lo is None or s[0] < lo else lo
            hi = s[1] if hi is None or s[1] > hi else hi
        out[c] = [lo, hi]
    return out


def _bits_to_hex(bits) -> str:
    """Sorted bit-position list -> hex bitmap, sized to the highest set
    bit (a probe position beyond the bitmap reads 0 = definitely absent,
    so the encoding needs no knowledge of the bloom's m)."""
    if not bits:
        return ""
    arr = bytearray(max(bits) // 8 + 1)
    for b in bits:
        arr[b // 8] |= 1 << (b % 8)
    return bytes(arr).hex()


def _hex_has_bits(hx: str, positions: list[int]) -> bool:
    """True iff every probe position is set in the hex bitmap."""
    arr = bytes.fromhex(hx) if hx else b""
    for p in positions:
        if p // 8 >= len(arr) or not (arr[p // 8] >> (p % 8)) & 1:
            return False
    return True


def _write_segment_entries(
    spark: SparkSession,
    path: str,
    version: int,
    files: list[str],
    stats: dict,
    counts: dict,
    blooms: dict,
    sizes: dict,
    colmeta: dict | None = None,
    raw_sizes: dict | None = None,
) -> list[dict]:
    """Pack per-file metadata into immutable segment files and return
    the version manifest's segment entries.  Chunking at
    ``_SEGMENT_MAX_FILES`` bounds both the size of one segment JSON and
    the planning cost per surviving segment; entry ``n_rows`` / ``bytes``
    are None when any member file lacks the figure (callers then fall
    back to a real scan / listing)."""
    entries: list[dict] = []
    ordered = sorted(files)
    for i in range(0, len(ordered), _SEGMENT_MAX_FILES):
        chunk = ordered[i : i + _SEGMENT_MAX_FILES]
        bases = [f.rsplit("/", 1)[-1] for f in chunk]
        seg_stats = {b: stats[b] for b in bases if b in stats}
        seg_counts = {b: counts[b] for b in bases if b in counts}
        seg_blooms = {b: blooms[b] for b in bases if b in blooms}
        seg_sizes = {b: sizes[b] for b in bases if b in sizes}
        seg_raw = {
            b: raw_sizes[b] for b in bases if raw_sizes and b in raw_sizes
        }
        seg_colmeta = {
            b: colmeta[b] for b in bases if colmeta and b in colmeta
        }
        seg_path = (
            f"{path}/{_MANIFEST_DIR}/segments/"
            f"v{version}-{uuid.uuid4().hex[:8]}.json"
        )
        _write_text(
            spark,
            seg_path,
            json.dumps(
                {
                    "files": chunk,
                    "stats": seg_stats,
                    "counts": seg_counts,
                    "blooms": seg_blooms,
                    "sizes": seg_sizes,
                    "raw_sizes": seg_raw,
                    "colmeta": seg_colmeta,
                },
                default=str,
            ),
        )
        # segment-level Bloom UNION (hex bitmap, ~m/4 bytes max): lets a
        # point probe skip the WHOLE segment without loading it.  Only
        # recorded when EVERY member file has a bloom entry — a missing
        # file bloom makes the union unable to say "definitely absent"
        bloom_union = (
            _bits_to_hex(sorted({b for bs in seg_blooms.values() for b in bs}))
            if seg_blooms and all(b in seg_blooms for b in bases)
            else None
        )
        entries.append(
            {
                "path": seg_path,
                "n_files": len(chunk),
                "bloom_union": bloom_union,
                "n_rows": (
                    sum(int(seg_counts[b]) for b in bases)
                    if all(b in seg_counts for b in bases)
                    else None
                ),
                "bytes": (
                    sum(int(seg_sizes[b]) for b in bases)
                    if all(b in seg_sizes for b in bases)
                    else None
                ),
                "raw_bytes": (
                    sum(int(seg_raw[b]) for b in bases)
                    if all(b in seg_raw for b in bases)
                    else None
                ),
                "stats": _aggregate_seg_stats(bases, seg_stats),
            }
        )
    return entries


def _entries_from_inline(
    spark: SparkSession, path: str, version: int, m: dict
) -> list[dict]:
    """One-time migration of a format-1 manifest: pack its inline
    per-file maps into segment files (written under ``version``'s name,
    so vacuum's in-flight grace covers them) and return the entries —
    zero data IO, O(head files) metadata."""
    return _write_segment_entries(
        spark,
        path,
        version,
        m["files"],
        m.get("stats", {}) or {},
        m.get("counts") or {},
        m.get("blooms", {}) or {},
        m.get("sizes", {}) or {},
        m.get("colmeta", {}) or {},
        m.get("raw_sizes", {}) or {},
    )


def _entry_range_keeps(entry_stats: dict, col: str, lo, hi) -> bool:
    """Segment-entry-level range test (True = cannot skip).  Mirrors the
    per-file semantics; a bound/stat pair the comparison cannot order
    (e.g. a date bound against a migrated string stat) conservatively
    keeps the segment — pruning is an optimization, never a filter."""
    s = entry_stats.get(col)
    if s is None:
        return True
    if s[0] is None or s[1] is None:
        return False
    try:
        return (lo is None or s[1] >= lo) and (hi is None or s[0] <= hi)
    except TypeError:
        return True


def _type_from_json(dtype_json: str):
    """Inverse of ``DataType.json()`` for the manifest's schema record."""
    return T._parse_datatype_json_string(dtype_json)


# --- hidden partitioning (Iceberg partition-spec transforms) ------------
#
# A PARTITION SPEC is a list of transform records over source columns:
#   {"transform": "bucket",   "n": 16, "source": "k"}
#   {"transform": "truncate", "w": 8,  "source": "s"}   (int: floor to a
#        multiple of w; string: w-char prefix — Iceberg semantics)
#   {"transform": "day",      "source": "ts"}           (date/timestamp ->
#        'yyyy-MM-dd'; lexicographic order == chronological)
#
# At commit time each transform's VALUE min/max is recorded per file
# under a derived stat name (below) in the SAME single stats scan as
# stats_cols — the reader's manifest pruning then treats them like any
# other stat, and the pushdown batch DataSource maps query predicates on
# the SOURCE column through the transform (pure-Python, parity-pinned
# for bucket's hash) before probing.  This is Iceberg's hidden
# partitioning: the query names the natural column; the layout work is
# invisible to it.  bucket hashes with Spark's single-arg xxhash64 over
# CAST(x AS STRING) (seed 42) so the no-JVM planner reproduces it with
# the same XXH64 the bloom probe already pins bit-for-bit.


def partition_stat_name(spec: dict) -> str:
    """Derived manifest-stat name for one transform record."""
    t = spec["transform"]
    if t == "bucket":
        return f"_pt_bucket_{int(spec['n'])}_{spec['source']}"
    if t == "truncate":
        return f"_pt_trunc_{int(spec['w'])}_{spec['source']}"
    if t == "day":
        return f"_pt_day_{spec['source']}"
    raise ValueError(f"unknown partition transform {t!r}")


def _transform_exprs(schema: T.StructType, partition_spec: list[dict]) -> dict:
    """{derived stat name -> Column} for a commit's partition spec,
    validated against the delta's schema."""
    dtypes = {f.name: f.dataType for f in schema.fields}
    out: dict = {}
    for spec in partition_spec:
        src = spec.get("source")
        if src not in dtypes:
            raise ValueError(
                f"partition transform source {src!r} not in schema "
                f"{sorted(dtypes)}"
            )
        t = spec["transform"]
        c = F.col(src)
        if t == "bucket":
            # bucket sources are restricted to the int/string types the
            # READER's bucket_transform_value covers: a bucket on a
            # double/decimal/timestamp column would record stats no
            # probe can hit (silently useless), and because the commit
            # hashes CAST(x AS STRING), a numeric type change across
            # commits ('5' vs '5.0') would alter the hash under the
            # same derived stat name — a WRONG file skip after type
            # evolution, not just a dull one
            if not isinstance(
                dtypes[src],
                (
                    T.StringType,
                    T.LongType,
                    T.IntegerType,
                    T.ShortType,
                    T.ByteType,
                ),
            ):
                raise ValueError(
                    f"bucket transform needs an int or string source, "
                    f"got {dtypes[src].simpleString()} for {src!r}"
                )
            expr = F.when(
                c.isNotNull(),
                F.pmod(F.xxhash64(c.cast("string")), F.lit(int(spec["n"]))),
            )
        elif t == "truncate":
            w = int(spec["w"])
            if isinstance(dtypes[src], T.StringType):
                expr = F.substring(c, 1, w)
            elif isinstance(
                dtypes[src],
                (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
            ):
                expr = c - F.pmod(c, F.lit(w))
            else:
                raise ValueError(
                    f"truncate transform needs an int or string source, "
                    f"got {dtypes[src].simpleString()} for {src!r}"
                )
        elif t == "day":
            if not isinstance(dtypes[src], (T.DateType, T.TimestampType)):
                raise ValueError(
                    f"day transform needs a date/timestamp source, got "
                    f"{dtypes[src].simpleString()} for {src!r}"
                )
            expr = F.when(c.isNotNull(), F.date_format(c, "yyyy-MM-dd"))
        else:
            raise ValueError(f"unknown partition transform {t!r}")
        out[partition_stat_name(spec)] = expr
    return out


def _spec_derived_exprs(schema: T.StructType, spec: list | None) -> dict:
    """Transform expressions for the subset of a carried partition spec
    that still applies to ``schema`` — the BEST-EFFORT derivation
    mutators (merge/compact) use for their rewritten files: a spec
    whose source column is absent or re-typed contributes nothing
    (those files are conservatively kept at prune time), so carrying
    the property can never be wrong, only less sharp."""
    names = {f.name for f in schema.fields}
    out: dict = {}
    for s in spec or []:
        if s.get("source") in names:
            try:
                out.update(_transform_exprs(schema, [s]))
            except ValueError:
                pass
    return out


def _file_stats(
    spark: SparkSession,
    data_dir: str,
    files: list[str],
    stats_cols: list[str],
    dom_override: dict | None = None,
    derived: dict | None = None,
) -> tuple[dict, dict, dict, dict, dict]:
    """Per-file min/max for ``stats_cols`` PLUS per-file row counts PLUS
    per-file COLUMN STATISTICS (an HLL NDV sketch and a null count per
    stats column — the ANALYZE-lite Delta/Iceberg both record) over the
    files just written under ``data_dir`` — all in ONE distributed scan
    of the delta (grouped by input_file_name), keyed by file basename
    (part file names carry a write UUID, so basenames are unique for the
    layer's lifetime).  The counts are what make ``snapshot_row_count``
    a metadata-only operation — the Delta/Iceberg numRecords idea.

    The HLL sketches (Datasketches via ``hll_sketch_agg``; ~1.5 KB
    each, base64 in the segment file) are MERGEABLE:
    ``snapshot_col_stats`` unions them across any file subset without
    rescanning data, so table- and partition-level NDV stays
    O(metadata) as the layer grows — the inputs a join planner needs
    for build-side and selectivity estimates.  Integer columns sketch
    in their NATIVE long domain (recorded as ``dom: "long"`` so the
    figure composes with numeric range/join planning); everything else
    casts to string (``dom: "string"`` — also what every pre-recording
    file used).  Sketches union only within ONE domain: a long 5 and a
    string '5' hash differently, so ``snapshot_col_stats`` reports
    None for a column whose live files mix domains (honest partial
    coverage, same contract as missing sketches).

    Written files that yield no group are ZERO-ROW part files (e.g. an
    empty range partition); they get explicit [None, None] stats and a 0
    count so the pruner can always skip them — distinct from a file with
    NO stats entry, which a reader must conservatively keep."""
    import base64

    src_df = spark.read.parquet(data_dir)
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        # logical in-memory bytes (see _logical_size_expr): the
        # broadcast-decision input snapshot_table_raw_bytes folds —
        # computed in this same single scan of the just-written delta
        F.sum(_logical_size_expr(src_df.schema)).alias("__raw"),
    ]
    # hidden-partitioning transform values (``derived``: stat name ->
    # Column over the source schema) ride THE SAME single scan — min/max
    # only, no sketches (a transform's NDV is bounded by its definition)
    derived = derived or {}
    for j, (dname, dexpr) in enumerate(derived.items()):
        src_df = src_df.withColumn(f"__pt_{j}", dexpr)
        aggs.append(F.min(f"__pt_{j}").alias(f"__ptlo_{j}"))
        aggs.append(F.max(f"__pt_{j}").alias(f"__pthi_{j}"))
    dtypes = {f.name: f.dataType for f in src_df.schema.fields}
    doms = {
        c: (
            "long"
            if isinstance(
                dtypes.get(c),
                (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
            )
            else "string"
        )
        for c in stats_cols
    }
    # a layer's EXISTING sketches pin the domain per column (the same
    # inheritance contract as bloom m/k): an append/merge writing
    # long-domain sketches into a string-domain layer would make every
    # future union mixed-domain and permanently null the NDV
    if dom_override:
        for c in stats_cols:
            if c in dom_override:
                doms[c] = dom_override[c]
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"__lo_{c}"))
        aggs.append(F.max(c).alias(f"__hi_{c}"))
        probe = (
            F.col(c).cast("bigint")
            if doms[c] == "long"
            else F.col(c).cast("string")
        )
        aggs.append(F.hll_sketch_agg(probe).alias(f"__hll_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"__nulls_{c}"
            )
        )
    rows = (
        src_df.groupBy(F.input_file_name().alias("__f"))
        .agg(*aggs)
        .collect()
    )
    dnames = list(derived)
    stats = {
        f.rsplit("/", 1)[-1]: {
            c: [None, None] for c in (*stats_cols, *dnames)
        }
        for f in files
    }
    counts = {f.rsplit("/", 1)[-1]: 0 for f in files}
    raw_sizes = {f.rsplit("/", 1)[-1]: 0 for f in files}
    colmeta = {
        f.rsplit("/", 1)[-1]: {
            c: {"hll": None, "nulls": 0, "dom": doms[c]}
            for c in stats_cols
        }
        for f in files
    }
    for r in rows:
        base = r["__f"].rsplit("/", 1)[-1]
        stats[base] = {c: [r[f"__lo_{c}"], r[f"__hi_{c}"]] for c in stats_cols}
        for j, dname in enumerate(dnames):
            stats[base][dname] = [r[f"__ptlo_{j}"], r[f"__pthi_{j}"]]
        counts[base] = int(r["__n"])
        raw_sizes[base] = int(r["__raw"] or 0)
        colmeta[base] = {
            c: {
                "hll": (
                    base64.b64encode(bytes(r[f"__hll_{c}"])).decode("ascii")
                    if r[f"__hll_{c}"] is not None
                    else None
                ),
                "nulls": int(r[f"__nulls_{c}"] or 0),
                "dom": doms[c],
            }
            for c in stats_cols
        }
    return stats, counts, colmeta, raw_sizes, doms


_BLOOM_BITS = 8192
_BLOOM_HASHES = 4


def bloom_bits_for_rows(target_rows_per_file: int) -> int:
    """Bloom size honoring a layer's FILE-SIZE CONTRACT: ~12 bits per
    expected distinct key per file (k=4 -> ~0.6% FP), rounded up to a
    power of two, floored at the module default.  Pass the result as
    ``commit_snapshot(bloom_bits=...)`` on the layer-creating commit:
    the default 8192 bits saturate past ~1k distinct keys per file, and
    a SATURATED bloom admits every file — the point lookup silently
    degrades to a layer scan, which is exactly the failure mode a
    100 TB index layer cannot have."""
    m = _BLOOM_BITS
    while m < 12 * max(1, int(target_rows_per_file)):
        m <<= 1
    return m


def _file_blooms(
    spark: SparkSession,
    data_dir: str,
    files: list[str],
    bloom_col: str,
    *,
    m: int = _BLOOM_BITS,
    k: int = _BLOOM_HASHES,
) -> dict:
    """Per-file Bloom bit sets for ``bloom_col`` over the files just
    written — the point-lookup complement to ``_file_stats`` min/max
    (which cannot prune hash-scrambled high-cardinality keys, because
    every file's [min, max] then spans the whole domain).  ONE
    distributed scan of the delta; bits stored as a sorted int list in
    the manifest (sparse-friendly; at most ``m`` per file).  Hash family
    is xxhash64 over (value, seed) — executor-side only, which is fine:
    the bloom picks WHICH FILES are scanned and can never change a
    result, only cost.  NULLs set no bits (a point probe is
    NULL-rejecting by SQL semantics)."""
    probe = F.col(bloom_col).cast("string")
    rows = (
        spark.read.parquet(data_dir)
        .filter(F.col(bloom_col).isNotNull())
        .select(
            F.input_file_name().alias("__f"),
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(probe, F.lit(i)), F.lit(m))
                        for i in range(k)
                    ]
                )
            ).alias("__bit"),
        )
        .groupBy("__f")
        .agg(F.collect_set("__bit").alias("__bits"))
        .collect()
    )
    blooms = {f.rsplit("/", 1)[-1]: [] for f in files}
    for r in rows:
        blooms[r["__f"].rsplit("/", 1)[-1]] = sorted(
            int(b) for b in r["__bits"]
        )
    return blooms


def _bloom_positions_multi(
    spark: SparkSession, values: list, *, m: int, k: int
) -> list[list[int]]:
    """Per-value bit-position lists for a probe value list.

    int/str probes — every key column blooms are built for — hash
    through ``snapshot_batch.bloom_probe_positions``, the pure-Python
    XXH64 whose bit-parity with Spark's ``xxhash64`` is HARD-pinned by
    ``test_xxh64_parity_with_spark_is_pinned``: zero Spark jobs, zero
    py4j round-trips.  The prior shape ran one ``spark.range(1)`` job
    with values x k LITERAL expressions, so every distinct probe set
    paid a fresh plan + codegen compile (measured ~1s per indexed point
    lookup at r15, twice per lookup: strict-subset assertion + pruned
    read).  Value types whose CAST-to-string rendering the Python hash
    does not reproduce (float/decimal/date/bool) keep the exact
    literal-expression Spark job, so semantics cannot drift."""
    if not values:
        return []
    from .snapshot_batch import bloom_probe_positions

    out: list[list[int] | None] = [
        bloom_probe_positions(v, m=m, k=k) for v in values
    ]
    exotic = [(j, v) for j, v in enumerate(values) if out[j] is None]
    if exotic:
        row = spark.range(1).select(
            *[
                F.pmod(
                    F.xxhash64(F.lit(v).cast("string"), F.lit(i)),
                    F.lit(m),
                ).alias(f"b_{j}_{i}")
                for j, v in exotic
                for i in range(k)
            ]
        ).first()
        for j, _ in exotic:
            out[j] = [int(row[f"b_{j}_{i}"]) for i in range(k)]
    return out  # type: ignore[return-value]


def _bloom_positions(spark: SparkSession, value, *, m: int, k: int) -> list[int]:
    """The k bit positions one probe value hashes to."""
    return _bloom_positions_multi(spark, [value], m=m, k=k)[0]


def commit_snapshot(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    stats_cols: list[str] | None = None,
    txn: tuple[str, int] | None = None,
    bloom_col: str | None = None,
    bloom_bits: int | None = None,
    checks: dict[str, str] | None = None,
    expect_version: int | None = None,
    change_feed: bool | None = None,
    partition_spec: list[dict] | None = None,
    cluster: bool | int = False,
) -> int:
    """Commit ``df`` as the next version of the layer at ``path``.

    ``expect_version=N`` turns the commit into a COMPARE-AND-SWAP on the
    version number: it fails with ``FileExistsError`` unless the commit
    would land exactly at version N.  This is how a caller makes a
    check-then-act sequence safe (e.g. "bootstrap the layer iff it is
    still empty" -> ``expect_version=1``): without it, a writer that
    raced past the caller's check would silently make this commit an
    overwrite of the winner's data instead of a detectable conflict.

    ``txn=(app_id, version)`` makes the commit IDEMPOTENT per writer
    application (the Delta ``txnAppId``/``txnVersion`` pattern): the
    manifest carries a per-app high-water map, and a commit whose
    version is <= the app's recorded high water is a NO-OP returning the
    current head — exactly what a replayed streaming micro-batch must
    be.  The map is carried forward by every commit, so interleaved
    writers don't erase each other's watermarks.

    ``mode="overwrite"`` makes the new version exactly ``df``;
    ``mode="append"`` makes it the previous version's file set plus
    ``df``'s new files — an append commits WITHOUT rewriting or even
    reading old data (manifest reuse), which is what makes daily
    ingest O(delta) instead of O(table).

    ``stats_cols`` collects per-file min/max for those columns into the
    manifest (one extra scan of the NEW files only) — the data-skipping
    index ``read_snapshot(prune_range=...)`` uses to drop whole files
    before the scan plans.  Cluster the data on the stats column first
    (``df.repartitionByRange(n, col)``) so file ranges are disjoint and
    skipping is sharp.  Append commits merge the prior stats map.

    Data files stage under ``data/v{N}-{token}/`` first — the token is
    a per-commit random suffix, so an ABORTED commit's staging dir can
    never collide with a retry's (a crash between staging and manifest
    write leaves an orphan dir that ``vacuum_snapshots`` GCs, and never
    wedges the layer), and two writers racing on the same version number
    stage independently; only the manifest rename decides the winner
    (optimistic concurrency — the loser retries against the new head).

    Appends are schema-checked against the previous manifest's recorded
    schema: NEW columns are allowed (additive evolution — read them with
    ``merge_schema=True``), but a column re-typed between commits raises
    ``ValueError`` at the WRITE, instead of leaving a layer whose
    merge-schema reads explode in Spark's footer merge.

    ``change_feed=True`` enables the layer's CHANGE DATA FEED table
    property (Delta's ``enableChangeDataFeed``): subsequent MERGE and
    predicate-DELETE commits record their exact row-level changes as
    per-commit change files, making ``snapshot_changes`` over such a
    version range O(changed rows) instead of two full-table
    ``exceptAll`` shuffles.  The property carries forward through every
    later commit until explicitly set False.  Appends need no change
    files (their inserts fall out of the manifest segment diff for
    free); an overwrite records none (its diff would be O(table) — the
    generic feed is the honest tool there).

    ``partition_spec`` declares HIDDEN PARTITIONING (Iceberg partition
    transforms): a list of ``{"transform": "bucket", "n": 16,
    "source": col}`` / ``{"transform": "truncate", "w": 8, "source":
    col}`` / ``{"transform": "day", "source": ts_col}`` records.  Each
    transform's per-file [min, max] VALUE is computed in the same
    single stats scan as ``stats_cols`` and recorded under a derived
    stat name, and the spec itself becomes a table property (inherited
    by appends, carried by every later commit).  The pushdown batch
    DataSource (``snapshot_batch``) then maps a query's predicates on
    the SOURCE column through the transforms before probing — a point
    lookup on a hash-scrambled key prunes to the files holding its
    bucket with zero caller cooperation, which raw min/max can never do
    (every file's natural range spans the domain).  ``cluster=True``
    repartitions the delta by the transform values before writing, so
    each file holds few distinct transform values and pruning is sharp
    — the layout work Iceberg's write distribution does.
    Returns the committed version number.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError("mode must be 'overwrite' or 'append'")
    versions = snapshot_versions(spark, path)
    head = versions[-1] if versions else 0
    prev: dict = _manifest_raw(spark, path, head) if head else {}
    txn_map: dict = prev.get("txn", {})
    if txn is not None:
        app, tv = txn
        prev_tv = txn_map.get(app)
        if prev_tv is not None and int(prev_tv) >= int(tv):
            return head  # replayed transaction: already applied
        txn_map = {**txn_map, app: int(tv)}
    version = head + 1
    if expect_version is not None and expect_version != version:
        raise FileExistsError(
            f"concurrent commit: expected to commit v{expect_version} "
            f"at {path} but the head is v{head}"
        )
    schema_fields = {f.name: f.dataType.json() for f in df.schema.fields}
    if mode == "append" and head:
        prev_schema = prev.get("schema")
        if prev_schema:
            for name, dtype in prev_schema.items():
                if name in schema_fields and schema_fields[name] != dtype:
                    raise ValueError(
                        f"append re-types column {name!r}: committed "
                        f"{dtype}, delta {schema_fields[name]} — only "
                        "additive schema evolution is supported"
                    )
            # columns absent from the delta stay part of the layer schema
            schema_fields = {**prev_schema, **schema_fields}
    # CHECK constraints: explicit ``checks`` become the layer's table
    # property; an append inherits the head's recorded checks when none
    # are passed — the Delta CHECK-constraint contract (a writer cannot
    # dodge the table's invariants by omitting them)
    effective_checks = dict(checks or {})
    if mode == "append" and head and checks is None:
        effective_checks = prev.get("checks") or {}
    # Bloom parameters are PER LAYER, recorded in the manifest at commit
    # time and used verbatim at probe time: an append extending a layer
    # whose blooms were built with different (m, k) than the current
    # module constants must keep the layer's recorded parameters, or the
    # mixed bit sets would silently skip files that contain the value.
    # ``bloom_bits`` lets the LAYER-CREATING commit size the filter to
    # its file-size contract (m/n >= ~10 for a useful FP rate — the
    # default 8192 bits saturate past ~1k distinct keys per file, and a
    # saturated bloom admits everything, silently voiding point-lookup
    # pruning at production file sizes); appends inherit the pinned
    # size, and passing a conflicting value on an append raises rather
    # than corrupting the layer's recorded parameters
    bloom_m, bloom_k = int(bloom_bits or _BLOOM_BITS), _BLOOM_HASHES
    if mode == "append" and head and prev.get("bloom_m"):
        if bloom_bits is not None and int(bloom_bits) != int(prev["bloom_m"]):
            raise ValueError(
                f"bloom_bits={bloom_bits} conflicts with the layer's "
                f"pinned bloom_m={prev['bloom_m']} — bloom size is a "
                "layer property fixed at creation"
            )
        bloom_m, bloom_k = int(prev["bloom_m"]), int(prev["bloom_k"])
    # the change-feed flag is a TABLE PROPERTY: explicit argument wins,
    # otherwise it survives every commit (Delta's table-property model)
    effective_cdf = (
        bool(change_feed)
        if change_feed is not None
        else bool(prev.get("cdf")) if head else False
    )
    # partition spec is a table property too: explicit wins, appends
    # inherit the layer's recorded spec (hidden partitioning must hold
    # across the whole file set, or pruning loses its sharpness —
    # though never its safety: files without transform stats are kept)
    effective_spec = (
        partition_spec
        if partition_spec is not None
        else (prev.get("partition_spec") if mode == "append" and head else None)
    ) or None
    # PARTITION-SPEC EVOLUTION (Iceberg spec-id semantics): the ACTIVE
    # spec above governs write-time clustering + stat derivation for
    # THIS delta's files; ``partition_specs_all`` accumulates every
    # spec the layer has ever written under, so the pushdown reader can
    # probe OLD files through the stats they actually carry after the
    # spec changes (files lacking a probed stat are conservatively
    # kept — pruning is an optimization, never the correctness
    # boundary, so an evolved layer is never wrong, only as sharp as
    # each file's own spec allows).  Overwrites reset the history: the
    # new content carries only its own spec (older VERSIONS keep their
    # own manifests for time travel).
    if mode == "append" and head:
        specs_all = list(
            prev.get("partition_specs_all") or prev.get("partition_spec") or []
        )
    else:
        specs_all = []
    _seen_specs = {partition_stat_name(s) for s in specs_all}
    for s in effective_spec or []:
        if partition_stat_name(s) not in _seen_specs:
            specs_all.append(s)
            _seen_specs.add(partition_stat_name(s))
    derived_exprs = (
        _transform_exprs(df.schema, effective_spec) if effective_spec else {}
    )
    if cluster and derived_exprs:
        # EXPLICIT partition count: an unnumbered repartition is AQE
        # fair game for coalescing small shuffles down to one file,
        # which would erase the layout this clustering exists to build.
        # cluster=True derives the count from the spec (product of
        # bucket widths when every transform is a bucket — one file per
        # bucket tuple); cluster=<int> pins it outright.
        if cluster is True:
            nparts = 1
            for spec in effective_spec:
                if spec["transform"] != "bucket":
                    nparts = 0
                    break
                nparts *= int(spec["n"])
            nparts = nparts or int(
                spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
        else:
            nparts = int(cluster)
        df = df.repartition(nparts, *derived_exprs.values())
    data_dir = f"{path}/data/v{version}-{uuid.uuid4().hex[:8]}"
    df.write.mode("error").parquet(data_dir)
    if effective_checks:
        _enforce_checks(spark, data_dir, effective_checks)
    files = _list_parquet_files(spark, data_dir)
    # appends inherit the layer's recorded sketch domains; layers from
    # before domain recording default to the string-cast domain their
    # sketches were built in
    if mode == "append" and head:
        inherited_doms = prev.get("stat_doms")
        if inherited_doms is None:
            inherited_doms = {c: "string" for c in stats_cols or []}
    else:
        inherited_doms = None
    stats, counts, colmeta, raw_sizes, stat_doms = _file_stats(
        spark, data_dir, files, stats_cols or [], inherited_doms,
        derived_exprs,
    )
    if mode == "append" and head:
        stat_doms = {**(prev.get("stat_doms") or {}), **stat_doms}
    if not stats_cols and not derived_exprs:
        stats = {}
    blooms = (
        _file_blooms(spark, data_dir, files, bloom_col, m=bloom_m, k=bloom_k)
        if bloom_col
        else {}
    )
    sizes = _list_parquet_sizes(spark, data_dir)
    # default=str inside the segment/manifest writers: non-JSON stat
    # types (dates/timestamps) serialize as ISO strings, whose
    # lexicographic order matches their natural order — pass string
    # bounds to prune_range for those columns
    new_entries = _write_segment_entries(
        spark,
        path,
        version,
        files,
        stats,
        counts,
        blooms,
        sizes,
        colmeta,
        raw_sizes,
    )
    delete_files: list = []
    carried_entries: list = []
    if mode == "append" and head:
        # O(delta) manifest write: the head's segment entries carry BY
        # REFERENCE; only the delta's files got new segments.  A
        # format-1 head migrates here (its inline maps pack into
        # segments once; zero data IO)
        if prev.get("format", 1) >= 2:
            carried_entries = prev.get("segments") or []
        else:
            carried_entries = _entries_from_inline(
                spark, path, version, _manifest(spark, path, head)
            )
        # old files' deletion vectors stay valid: appends add files only
        delete_files = prev.get("delete_files") or []
    _write_text(
        spark,
        f"{path}/{_MANIFEST_DIR}/v{version}.json",
        json.dumps(
            {
                "version": version,
                "committed_at": time.time(),
                "mode": mode,
                "format": 2,
                "segments": carried_entries + new_entries,
                "bloom_col": bloom_col
                or (prev.get("bloom_col") if mode == "append" and head else None),
                "bloom_m": bloom_m,
                "bloom_k": bloom_k,
                "delete_files": delete_files,
                "schema": schema_fields,
                "checks": effective_checks,
                "stat_doms": stat_doms,
                "cdf": effective_cdf,
                "partition_spec": effective_spec,
                "partition_specs_all": specs_all or None,
                "txn": txn_map,
            },
            default=str,
        ),
    )
    return version


def _enforce_checks(
    spark: SparkSession, data_dir: str, checks: dict[str, str]
) -> None:
    """Reject the staged delta if any CHECK predicate has violations —
    ONE aggregate scan of the NEW files only, all predicates at once.
    SQL CHECK semantics: a predicate evaluating to NULL is NOT a
    violation (use an explicit ``col IS NOT NULL`` check for NOT NULL).
    On failure the staged directory is deleted — nothing was committed
    (the manifest is the commit point), so the layer is untouched."""
    aggs = [
        F.sum(F.when(~F.expr(pred), 1).otherwise(0)).alias(name)
        for name, pred in checks.items()
    ]
    row = spark.read.parquet(data_dir).agg(*aggs).first()
    bad = {
        name: int(row[name]) for name in checks if row[name] and row[name] > 0
    }
    if bad:
        jvm, fs = _fs(spark, data_dir)
        fs.delete(_hpath(jvm, data_dir), True)
        raise ValueError(
            f"CHECK constraint violation(s), commit rejected: "
            + ", ".join(
                f"{n!r} ({c} rows fail: {checks[n]})" for n, c in bad.items()
            )
        )


def retry_commit(fn, *, attempts: int = 3, backoff_seconds: float = 0.05):
    """Run a layer mutation under OPTIMISTIC-CONCURRENCY retry: call
    ``fn`` (a zero-arg closure over ``commit_snapshot`` /
    ``merge_snapshot`` / ``delete_snapshot``), and when it loses the
    manifest rename race (``FileExistsError``), call it again — every
    mutator re-reads the head INSIDE the call, so the loser recomputes
    against the winner's committed state, exactly the
    read-check-rewrite loop Delta/Iceberg writers run.  The loser's
    orphaned staging dir is retention-GC'd by ``vacuum_snapshots``.
    Idempotent ``txn`` markers compose: a retry whose transaction
    already won just no-ops.  Raises the last conflict after
    ``attempts`` tries.

    Retries wait a RANDOMIZED EXPONENTIAL backoff (jittered full range,
    doubling base, capped at ~2 s) before re-running: immediate retries
    under real multi-writer contention synchronize the losers so they
    all collide again — jitter is what de-correlates them (the standard
    OCC/AIMD argument).  ``backoff_seconds=0`` restores immediate
    retry for single-process tests."""
    import random

    last: FileExistsError | None = None
    n = max(1, attempts)
    for i in range(n):
        try:
            return fn()
        except FileExistsError as e:
            last = e
            if backoff_seconds > 0 and i < n - 1:
                time.sleep(
                    random.uniform(0, min(2.0, backoff_seconds * (2**i)))
                )
    raise last


def snapshot_files(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    *,
    prune_range: tuple[str, object, object] | list[tuple] | None = None,
    prune_point: tuple[str, object] | None = None,
) -> list[str]:
    """The file list a read of this version plans over, after manifest
    data skipping.  ``prune_range=(col, lo, hi)`` keeps only files whose
    committed [min, max] for ``col`` intersects [lo, hi] (files lacking
    stats are conservatively kept; None bounds are open).
    ``prune_point=(col, value)`` additionally consults the per-file
    Bloom index (``commit_snapshot(bloom_col=col)``): a file whose bloom
    is missing ANY of the probe's bit positions definitely does not
    contain the value and is skipped — the point-lookup index for
    hash-scrambled high-cardinality keys where every file's [min, max]
    spans the whole domain.  False positives only cost a scanned file,
    never correctness; files without a bloom entry are kept.

    ``value`` may also be a list/tuple/set — the ``col IN (...)``
    planning shape: a file survives if ANY probe value might be present
    (per-value positions OR-ed at the keep decision, the same plan an
    IN-list gets from Parquet bloom filters).

    ``value`` may ALSO be a DataFrame of probe values (one column, or a
    column named ``col``) — the LARGE-BATCH planning shape: probe bit
    positions are computed on the EXECUTORS through Spark's own
    xxhash64 (zero probe values ever cross to the driver — the
    ``delete_snapshot_keys`` DataFrame-path discipline), matched
    bit-level against the manifest's per-file blooms, and only the
    admitted FILE NAMES return to the driver.  Keep semantics are
    identical to the list path; the segment-level bloom-union skip is
    bypassed (conservative keep) because it is a driver-side hex-string
    check."""
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(
            f"version {v} not in {versions} at {path}"
            + (
                " (older versions may have been vacuumed — "
                "see vacuum_snapshots keep_last)"
                if versions and v < versions[0]
                else ""
            )
        )
    m = _manifest_raw(spark, path, v)
    # one (col, lo, hi) tuple, or a list of them ANDed together —
    # the multi-dimensional probe a Z-ordered layout makes sharp
    ranges = (
        []
        if prune_range is None
        else [prune_range]
        if isinstance(prune_range, tuple)
        else list(prune_range)
    )
    # probe positions are computed ONCE per plan (one Spark job for the
    # whole IN list) and shared by the segment-union and per-file probes
    pos_list: list[list[int]] | None = None
    probe_df: DataFrame | None = None
    bloom_m = int(m.get("bloom_m") or _BLOOM_BITS)
    bloom_k = int(m.get("bloom_k") or _BLOOM_HASHES)
    if prune_point is not None and m.get("bloom_col") == prune_point[0]:
        if isinstance(prune_point[1], DataFrame):
            probe_df = prune_point[1]
        else:
            values = _point_values(prune_point[1])
            _POINT_PROBE_DRIVER_KEYS["n"] += len(values)
            pos_list = _bloom_positions_multi(
                spark, values, m=bloom_m, k=bloom_k
            )
    if m.get("format", 1) >= 2:
        # segment-level skip FIRST: entries whose per-column [min, max]
        # cannot intersect the range are dropped before their segment
        # file is even opened — planning cost is O(surviving segments),
        # not O(all files ever), the property that keeps a 10^7-file
        # layer plannable from KBs of JSON
        entries = m.get("segments") or []
        for col, lo, hi in ranges:
            entries = [
                e
                for e in entries
                if _entry_range_keeps(e.get("stats") or {}, col, lo, hi)
            ]
        if pos_list is not None:
            # segment-level bloom skip: a segment whose recorded bloom
            # UNION is missing any probe bit definitely lacks the value
            # — skipped without even loading its segment file (entries
            # without a union are conservatively loaded).  IN-lists keep
            # a segment if ANY value's bits are all present.
            entries = [
                e
                for e in entries
                if e.get("bloom_union") is None
                or any(_hex_has_bits(e["bloom_union"], pos) for pos in pos_list)
            ]
        files = []
        stats = {}
        blooms = {}
        for e in entries:
            seg = _read_segment(spark, e["path"])
            files.extend(seg["files"])
            stats.update(seg.get("stats") or {})
            blooms.update(seg.get("blooms") or {})
        files = sorted(files)
    else:
        files = m["files"]
        stats = m.get("stats", {})
        blooms = m.get("blooms", {})
    for col, lo, hi in ranges:
        kept = []
        for f in files:
            s = stats.get(f.rsplit("/", 1)[-1], {}).get(col)
            if s is None:
                kept.append(f)  # no stats recorded -> cannot skip safely
            elif s[0] is None or s[1] is None:
                # stats recorded but no min/max: zero rows, or every
                # value NULL — safe to skip either way, because a range
                # predicate is NULL-rejecting (the caller's contract)
                continue
            elif (lo is None or s[1] >= lo) and (hi is None or s[0] <= hi):
                kept.append(f)
        files = kept
    if pos_list is not None:
        if blooms:
            # probe with the LAYER'S recorded bloom parameters (manifests
            # from before parameter recording used the then-current
            # constants, which the defaults preserve), reusing the
            # positions computed once above
            kept = []
            for f in files:
                bits = blooms.get(f.rsplit("/", 1)[-1])
                if bits is None:
                    kept.append(f)  # no bloom recorded -> keep
                else:
                    bitset = set(bits)
                    # IN-list: maybe-present for ANY probe value keeps
                    # the file (bloom can't say no)
                    if any(all(p in bitset for p in pos) for pos in pos_list):
                        kept.append(f)
            files = kept
    if probe_df is not None and blooms:
        files = _prune_files_probe_df(
            spark,
            files,
            blooms,
            prune_point[0],
            probe_df,
            m=bloom_m,
            k=bloom_k,
        )
    return files


#: driver-side probe-key volume moved by LIST-form point probes — the
#: DataFrame probe path ships zero; tests pin it
_POINT_PROBE_DRIVER_KEYS = {"n": 0}


def _prune_files_probe_df(
    spark: SparkSession,
    files: list[str],
    blooms: dict,
    col: str,
    probe_df: DataFrame,
    *,
    m: int,
    k: int,
) -> list[str]:
    """Executor-side bloom evaluation for a DATAFRAME of probe values.

    The list-probe path collects every probe value to the driver to
    compute bit positions — fine for an interactive lookup, fatal for a
    "dedup this 10M-doc shard against the corpus" batch (q x bands
    probe keys would build the planner's IN list).  Here the probe side
    stays distributed end to end: per distinct value its k bit
    positions come from the same ``xxhash64(value, seed) % m`` family
    the commit used (through Spark, so commit and probe can never drift
    on hash semantics), the manifest's per-file bloom bit sets —
    metadata scale by construction — broadcast as (file, bit) rows, and
    a value admits a file iff the bit-level join matches ALL of its
    distinct positions (``count_distinct(bit) == k_distinct``), exactly
    the list path's all-bits-present test.  Only admitted file NAMES
    cross to the driver: O(admitted files), never O(probe keys).  Files
    without a recorded bloom are conservatively kept; NULL probes set
    no bits (point probes are NULL-rejecting)."""
    named = [(f, f.rsplit("/", 1)[-1]) for f in files]
    with_bloom = [
        (base, blooms[base])
        for _, base in named
        if blooms.get(base) is not None
    ]
    if not with_bloom:
        return files
    raw_values = probe_df.select(
        F.col(col).cast("string").alias("__v")
    ).filter(F.col("__v").isNotNull())
    values = raw_values.distinct()
    # SATURATION short-circuit: pruning is an optimization and keep-all
    # is always sound, so skip the probes x file-bits join whenever it
    # provably cannot prune.  With n distinct probe values the probe
    # side sets each of the m bits with p = 1 - (1 - 1/m)^(n*k); a file
    # is FALSELY admitted by one value with probability ~p^k, so the
    # expected number of admitting values per file is n * p^k — once
    # that reaches ~1, every file is admitted regardless of true
    # membership and the join is pure planning cost (r15: a whole-corpus
    # admission batch paid ~1s here to prune zero of 66 files).  The old
    # n*k >= m test is the p = 1 - 1/e special case; this bound fires
    # earlier for exactly the batches that cannot prune while leaving
    # genuinely selective probes (small n => p^k astronomically small)
    # untouched.
    import math

    # the bound only needs an ESTIMATE of n: the bloom test itself never
    # uses n, and keep-all is sound, so an HLL estimate (±5% default rsd)
    # merely moves WHERE the short-circuit fires — over-estimate = keep
    # all (sound), under-estimate = run the join (correct, just slower).
    # approx_count_distinct aggregates map-side over the PRE-distinct
    # relation, replacing the full distinct shuffle + count the exact
    # count paid on every whole-corpus admission batch (r15's remaining
    # fixed cost on indexed_neardup_batch_admission).
    n_values = int(
        raw_values.agg(F.approx_count_distinct("__v")).first()[0]
    )
    p_bit = 1.0 - math.exp(-(n_values * k) / float(m))
    if n_values * (p_bit**k) >= 1.0:
        return files
    pos = values.select(
        "__v",
        F.array_distinct(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col("__v"), F.lit(i)), F.lit(m))
                    for i in range(k)
                ]
            )
        ).alias("__pos"),
    ).select(
        "__v",
        F.size("__pos").alias("__kd"),
        F.explode("__pos").alias("__bit"),
    )
    bits_df = spark.createDataFrame(
        [(base, [int(x) for x in bl]) for base, bl in with_bloom],
        "__file string, __bits array<long>",
    ).select("__file", F.explode("__bits").alias("__bit"))
    # (v, file, bit) triples are already DISTINCT — a value's positions
    # are array_distinct'd and a file's bloom bits are a set — so a
    # plain count equals count_distinct without the expand
    admitted = {
        r["__file"]
        for r in pos.join(F.broadcast(bits_df), "__bit")
        .groupBy("__v", "__kd", "__file")
        .agg(F.count(F.lit(1)).alias("__hit"))
        .filter(F.col("__hit") == F.col("__kd"))
        .select("__file")
        .distinct()
        .collect()
    }
    return [
        f
        for f, base in named
        if base in admitted or blooms.get(base) is None
    ]


def _point_values(value: object) -> list:
    """Normalize a ``prune_point`` probe to a value list: scalars become
    a one-element list; lists/tuples/sets pass through (the IN-list
    shape).  Strings/bytes are scalars, not sequences."""
    if isinstance(value, (list, tuple, set, frozenset)):
        return list(value)
    return [value]


def _split_delete_entries(
    entries: list, bases: set[str]
) -> tuple[list[str], list[tuple], set[str]]:
    """Classify the manifest's delete entries against a file-base set:
    returns (position-delete dirs, [(keys_path, key_col, touch_set)]
    for equality entries, union of touched bases)."""
    pos_dirs: list[str] = []
    eq: list[tuple] = []
    dirty: set[str] = set()
    for e in entries:
        touch = set(e["touches"]) & bases
        if not touch:
            continue
        dirty |= touch
        if e.get("kind") == "equality":
            eq.append((e["path"], e["key_col"], touch))
        else:
            pos_dirs.append(e["path"])
    return pos_dirs, eq, dirty


def _apply_deletes_meta(
    spark: SparkSession, df: DataFrame, pos_dirs: list[str], eq: list[tuple]
) -> DataFrame:
    """Drop deleted rows from ``df`` (which must carry ``__dv_file`` /
    ``__dv_pos`` metadata columns).  Position deletes are one anti-join
    on (file, pos).  Each EQUALITY entry is two broadcast joins — the
    key set (O(keys) metadata) and the entry's touch scope (O(touched
    files)) — and a residual filter: a row is dropped iff its key is in
    the entry's key set AND its file was live when the delete committed,
    which is what keeps later-appended rows with the same key alive
    (no-resurrect, the Iceberg sequence-number semantics).  A NULL key
    never matches (SQL equality).  No step is ever O(data x keys)."""
    if pos_dirs:
        dv = spark.read.parquet(*pos_dirs).select(
            F.col("file").alias("__dv_file"), F.col("pos").alias("__dv_pos")
        )
        df = df.join(dv, ["__dv_file", "__dv_pos"], "left_anti")
    for i, (kpath, key_col, touch) in enumerate(eq):
        keys = (
            spark.read.parquet(kpath)
            .select(F.col(key_col).alias(f"__eq_k_{i}"))
            .distinct()
            .withColumn(f"__eq_hit_{i}", F.lit(True))
        )
        scope = spark.createDataFrame(
            [(b,) for b in sorted(touch)], "__dv_file string"
        ).withColumn(f"__eq_scope_{i}", F.lit(True))
        df = (
            df.join(
                F.broadcast(keys),
                F.col(key_col) == F.col(f"__eq_k_{i}"),
                "left",
            )
            .join(F.broadcast(scope), "__dv_file", "left")
            .filter(
                ~(
                    F.coalesce(F.col(f"__eq_hit_{i}"), F.lit(False))
                    & F.coalesce(F.col(f"__eq_scope_{i}"), F.lit(False))
                )
            )
            .drop(f"__eq_k_{i}", f"__eq_hit_{i}", f"__eq_scope_{i}")
        )
    return df


def _trim_delete_entries(entries: list, rewritten_bases: set[str]) -> list:
    """Carry delete entries past a rewrite: REWRITTEN files folded their
    deletions into the rewrite, so exactly those bases drop out of each
    entry's touches (position entries keep per-file counts; equality
    entries keep their touch list and kind/key metadata).  Entries left
    touching nothing drop entirely, freeing their dirs for vacuum."""
    out = []
    for e in entries or []:
        if e.get("kind") == "equality":
            trimmed = [b for b in e["touches"] if b not in rewritten_bases]
            if trimmed:
                out.append({**e, "touches": trimmed})
        else:
            trimmed_map = {
                b: n
                for b, n in e["touches"].items()
                if b not in rewritten_bases
            }
            if trimmed_map:
                out.append({"path": e["path"], "touches": trimmed_map})
    return out


def _apply_delete_entries(
    spark: SparkSession, manifest: dict, files: list[str], reader
) -> DataFrame | None:
    """Merge-on-read application of the manifest's delete files —
    POSITION deletes (``(file, pos)`` pairs, the Iceberg v2 / Delta
    deletion-vector shape) and EQUALITY deletes (a key set scoped to the
    files live at delete time, Iceberg's second v2 flavor): matching
    rows are dropped AT READ TIME; the data files are never rewritten.

    Only DIRTY files (named in some delete entry's ``touches``) pay the
    metadata-column read and the joins; clean files stream through the
    plain parquet scan untouched, so a layer with a handful of deletes
    reads at full scan speed everywhere else.  Row identity is
    ``_metadata.row_index`` — the physical position in an immutable
    data file, stable because every other mutation path here is
    copy-on-write.  Returns None when no kept file is dirty (caller does
    the plain read)."""
    entries = manifest.get("delete_files") or []
    if not entries or not files:
        return None
    bases = {f.rsplit("/", 1)[-1]: f for f in files}
    pos_dirs, eq, dirty_bases = _split_delete_entries(entries, set(bases))
    if not dirty_bases:
        return None
    dirty = [bases[b] for b in sorted(dirty_bases)]
    clean = [f for f in files if f.rsplit("/", 1)[-1] not in dirty_bases]
    base_expr = F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
    dirty_df = _apply_deletes_meta(
        spark,
        reader.parquet(*dirty).select(
            "*",
            base_expr.alias("__dv_file"),
            F.col("_metadata.row_index").alias("__dv_pos"),
        ),
        pos_dirs,
        eq,
    ).drop("__dv_file", "__dv_pos")
    if clean:
        # allowMissingColumns: under merge_schema the clean and dirty
        # subsets may see different column sets; missing ones read NULL
        return reader.parquet(*clean).unionByName(
            dirty_df, allowMissingColumns=True
        )
    return dirty_df


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    *,
    prune_range: tuple[str, object, object] | list[tuple] | None = None,
    prune_point: tuple[str, object] | None = None,
    merge_schema: bool = False,
    as_of: float | None = None,
) -> DataFrame:
    """Read one version of the layer (default: the head).  The scan plans
    from the manifest's exact file list — no directory listing.
    ``as_of=epoch_seconds`` resolves the version by commit time instead
    (TIMESTAMP AS OF; mutually exclusive with ``version``).

    ``prune_range=(col, lo, hi)`` applies manifest-level data skipping:
    files whose committed [min, max] cannot intersect the range are
    dropped BEFORE Spark ever opens a footer — at 100 TB this is the
    difference between planning over the table and planning over the
    few files a selective range touches.  Skipping is an optimization
    only, never a filter: files that straddle the bound still contribute
    out-of-range rows, so apply the actual predicate on the result (it
    also pushes down to the parquet footers as usual).

    ``merge_schema=True`` unifies schemas across commits (an append may
    add columns; old files read NULL for them) at the cost of a footer
    pass per distinct file schema — additive evolution, same contract as
    parquet ``mergeSchema``.  The default reads with the newest file's
    schema, the cheap path when the layer's schema is stable."""
    if as_of is not None:
        if version is not None:
            raise ValueError("version and as_of are mutually exclusive")
        version = snapshot_version_as_of(spark, path, as_of)
    # resolve the head ONCE and pin it: resolving again per sub-step
    # (file list vs delete entries) would let a commit landing in between
    # produce a torn read — version N's files with version N+1's deletes
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    v = versions[-1] if version is None else version
    files = snapshot_files(
        spark, path, v, prune_range=prune_range, prune_point=prune_point
    )
    reader = spark.read.option("mergeSchema", str(merge_schema).lower())
    if files:
        dv_read = _apply_delete_entries(
            spark, _manifest_raw(spark, path, v), files, reader
        )
        if dv_read is not None:
            return dv_read
    if not files:
        # every file skipped: an empty typed frame needs the schema.
        # Newer manifests record it (no footer read at all); older layers
        # fall back to the (unpruned) manifest's files
        rec = _manifest_raw(spark, path, v).get("schema")
        if rec:
            schema = T.StructType(
                [
                    T.StructField(name, _type_from_json(dtype))
                    for name, dtype in rec.items()
                ]
            )
            return spark.createDataFrame([], schema)
        all_files = snapshot_files(spark, path, v)
        return reader.parquet(*all_files).limit(0)
    return reader.parquet(*files)


#: driver-side key volume moved by POSITION deletes (the list-probe
#: path only) — tests pin that the DataFrame path ships zero
_POS_DELETE_DRIVER_KEYS = {"n": 0}


def delete_snapshot(
    spark: SparkSession,
    path: str,
    predicate: str | None = None,
    *,
    keys: tuple[str, object] | None = None,
    prune_range: tuple[str, object, object] | list[tuple] | None = None,
    txn: tuple[str, int] | None = None,
) -> dict:
    """Merge-on-read DELETE: commit a new version in which every head
    row matching ``predicate`` (a SQL boolean expression over the
    layer's columns) is gone — WITHOUT rewriting a single data file.

    ``keys=(key_col, keys_df_or_list)`` is the KEY-MATCH form of the
    same position delete: matching rows are found with a broadcast
    LEFT SEMI join against the key set instead of a SQL expression, so
    a CDC sink's purge batch never funnels its keys through the driver
    (no IN-literal construction; a DataFrame key set stays on the
    executors end to end, and the matching scan still prunes — the
    key envelope [min, max] resolves from one 3-scalar agg when no
    ``prune_range`` is passed).  A plain Python list is accepted for
    interactive probes; its driver-side volume is counted in
    ``_POS_DELETE_DRIVER_KEYS`` so tests can pin that the streaming
    path ships zero.  Exactly one of ``predicate``/``keys`` must be
    given.  This is the position-delete twin of
    ``delete_snapshot_keys``'s DataFrame path: pick THIS when the
    layer's CDF readers must never pay the lazy pre-image
    materialization (the scan records full pre-images eagerly), and
    the metadata-only equality form when delete latency wins.

    Matching rows are recorded as POSITION DELETE FILES (parquet of
    ``(file, pos)`` under ``deletes/v{N}-{token}/`` — the Iceberg v2 /
    Delta deletion-vector design): the new manifest keeps the exact same
    data file set and appends the delete entry; readers anti-join dirty
    files against the delete set at scan time.  At 100 TB this is the
    difference between a DELETE that writes O(matches) bytes and one
    that rewrites every file containing a match (copy-on-write) — the
    right trade for frequent small deletes (GDPR erasure, retractions),
    with ``rewrite_snapshot`` as the periodic compaction that folds the
    vectors back in (its read applies them; its commit resets them).

    ``prune_range=(col, lo, hi)`` limits the matching SCAN to files
    whose stats intersect the range — pass it when the predicate implies
    a range on a stats column, so the delete scan prunes like any other
    read.  Files outside the pruned scan keep all their rows (caller's
    contract that the predicate cannot match there).

    The scan applies existing deletion vectors first, so re-deleting an
    already-deleted row is impossible and per-file delete counts stay
    exact — which is what keeps ``snapshot_row_count`` metadata-only.
    A predicate matching nothing is a NO-OP returning the current head.
    ``txn=(app_id, version)`` makes the DELETE idempotent per writer,
    exactly like ``commit_snapshot(txn=...)`` — the shape a streaming
    CDC sink replaying a micro-batch needs.
    Returns {"version", "rows_deleted", "files_touched"}.
    """
    if (predicate is None) == (keys is None):
        raise ValueError(
            "delete_snapshot takes exactly one of predicate= or keys="
        )
    keys_df = None
    if keys is not None:
        key_col, kv = keys
        if isinstance(kv, DataFrame):
            keys_df = kv.select(key_col).distinct()
        else:
            # interactive list probe: NULL keys never match under SQL
            # equality, so drop them up front (they would also break
            # schema inference); type comes from inference, matching
            # whatever the caller's literals are
            kv = [k for k in kv if k is not None]
            _POS_DELETE_DRIVER_KEYS["n"] += len(kv)
            if not kv:
                versions = snapshot_versions(spark, path)
                if not versions:
                    raise FileNotFoundError(
                        f"no committed snapshot under {path}"
                    )
                return {
                    "version": versions[-1],
                    "rows_deleted": 0,
                    "files_touched": 0,
                }
            keys_df = spark.createDataFrame(
                [(k,) for k in kv], [key_col]
            ).distinct()
        if prune_range is None:
            # one 3-scalar envelope agg (executor-side; only min/max/
            # count reach the driver — model-state scale, never keys)
            env = keys_df.agg(
                F.min(key_col).alias("lo"),
                F.max(key_col).alias("hi"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            if int(env["n"]) == 0:
                versions = snapshot_versions(spark, path)
                if not versions:
                    raise FileNotFoundError(
                        f"no committed snapshot under {path}"
                    )
                return {
                    "version": versions[-1],
                    "rows_deleted": 0,
                    "files_touched": 0,
                }
            prune_range = (key_col, env["lo"], env["hi"])
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    head = versions[-1]
    m = _manifest_raw(spark, path, head)
    txn_map: dict = m.get("txn", {})
    if txn is not None:
        app, tv = txn
        prev_tv = txn_map.get(app)
        if prev_tv is not None and int(prev_tv) >= int(tv):
            return {
                "version": head,
                "rows_deleted": 0,
                "files_touched": 0,
                "noop": True,
            }
        txn_map = {**txn_map, app: int(tv)}
    candidates = snapshot_files(spark, path, head, prune_range=prune_range)
    if not candidates:
        return {"version": head, "rows_deleted": 0, "files_touched": 0}
    base_expr = F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
    # mergeSchema: candidates may span schema evolutions — the predicate
    # can name an evolved column, and the CDF change file must carry the
    # full evolved row, not the oldest footer's subset
    df = spark.read.option("mergeSchema", "true").parquet(*candidates).select(
        "*",
        base_expr.alias("__dv_file"),
        F.col("_metadata.row_index").alias("__dv_pos"),
    )
    entries = m.get("delete_files") or []
    if entries:
        # apply existing deletes (both kinds) first: re-deleting an
        # already-deleted row is impossible, so per-file delete counts
        # stay exact
        pos_dirs, eq, _ = _split_delete_entries(
            entries, {f.rsplit("/", 1)[-1] for f in candidates}
        )
        df = _apply_deletes_meta(spark, df, pos_dirs, eq)
    matched = (
        df.join(F.broadcast(keys_df), keys[0], "left_semi")
        if keys_df is not None
        else df.filter(F.expr(predicate))
    )
    if m.get("cdf"):
        # the matched rows feed BOTH the position-delete file and the
        # change file: one lazy local checkpoint computes the scan once
        matched = matched.transform(materialize)
    matches = matched.select(
        F.col("__dv_file").alias("file"), F.col("__dv_pos").alias("pos")
    )
    version = head + 1
    dv_dir = f"{path}/deletes/v{version}-{uuid.uuid4().hex[:8]}"
    matches.write.mode("error").parquet(dv_dir)
    per_file = (
        spark.read.parquet(dv_dir).groupBy("file").count().collect()
    )  # bounded by the candidate file count, never the data
    touches = {r["file"]: int(r["count"]) for r in per_file}
    n_deleted = sum(touches.values())
    jvm, fs = _fs(spark, path)
    if n_deleted == 0:
        fs.delete(_hpath(jvm, dv_dir), True)
        return {"version": head, "rows_deleted": 0, "files_touched": 0}
    # CHANGE DATA FEED: the matched rows ARE this commit's exact change
    # set — record them (full rows, 'delete'-typed) so the incremental
    # feed never rescans; the lazy checkpoint above means the predicate
    # scan already ran once for the position-delete file
    cdf_entry = None
    if m.get("cdf"):
        ch_dir = f"{path}/_changes/v{version}-{uuid.uuid4().hex[:8]}"
        (
            matched.drop("__dv_file", "__dv_pos")
            .withColumn("change_type", F.lit("delete"))
            .write.mode("error")
            .parquet(ch_dir)
        )
        cdf_entry = {"path": ch_dir}
    # a DELETE changes no data file: the new manifest carries the head's
    # segment entries BY REFERENCE and only appends the delete entry —
    # O(1) manifest bytes however large the table
    if m.get("format", 1) >= 2:
        seg_entries = m.get("segments") or []
    else:
        seg_entries = _entries_from_inline(
            spark, path, version, _manifest(spark, path, head)
        )
    _write_text(
        spark,
        f"{path}/{_MANIFEST_DIR}/v{version}.json",
        json.dumps(
            {
                "version": version,
                "committed_at": time.time(),
                "mode": "delete",
                "format": 2,
                "segments": seg_entries,
                "bloom_col": m.get("bloom_col"),
                "bloom_m": m.get("bloom_m"),
                "bloom_k": m.get("bloom_k"),
                "delete_files": entries + [{"path": dv_dir, "touches": touches}],
                "schema": m.get("schema"),
                "checks": m.get("checks") or {},
                "stat_doms": m.get("stat_doms"),
                "cdf": bool(m.get("cdf")),
                "partition_spec": m.get("partition_spec"),
                "partition_specs_all": m.get("partition_specs_all")
                or m.get("partition_spec"),
                "changes": cdf_entry,
                "txn": txn_map,
            },
            default=str,
        ),
    )
    return {
        "version": version,
        "rows_deleted": n_deleted,
        "files_touched": len(touches),
    }


def delete_snapshot_keys(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: list | DataFrame,
    *,
    txn: tuple[str, int] | None = None,
) -> dict:
    """KEY-EQUALITY merge-on-read DELETE (the Iceberg v2 second delete
    flavor): commit a new version in which every head row whose
    ``key_col`` equals one of ``keys`` is gone — writing **O(keys)
    metadata and reading ZERO data files**.

    This is the delete shape streaming CDC issues constantly at 100 TB:
    a position delete (``delete_snapshot``) must SCAN the matching files
    to name (file, pos) pairs — O(matching data) per DELETE — which
    defeats the O(delta) design when deletes arrive by key at stream
    rate.  Here the key set lands as a small parquet under ``deletes/``
    and the manifest entry records ``kind: "equality"`` plus the TOUCH
    SCOPE: the live files whose committed [min, max] key range could
    contain a key, resolved from MANIFEST STATS ALONE (segment-entry
    envelope first, then per-file ranges — the same two-level pruning as
    MERGE, no data IO).  Readers anti-join only in-scope dirty files
    against the key set (two broadcast joins per entry); rows appended
    AFTER the delete are outside every entry's scope, so a re-inserted
    key survives (no-resurrect — Iceberg's sequence-number semantics,
    expressed as an explicit file scope).

    ``keys`` may be a Python list (the small-probe shape) or a
    **DataFrame with a ``key_col`` column** — the DataFrame path never
    moves the key set through the driver: the sidecar parquet is
    written straight from the executors and the touch scope resolves
    from one 3-scalar ``agg(min, max, count)`` envelope joined against
    the (driver-resident, O(files)) manifest stats.  That is the shape
    a CDC sink applying a million-key purge batch needs; the list path
    stays for interactive probes (its driver-side key volume is
    counted in ``_EQ_DELETE_DRIVER_KEYS`` so tests can pin that the
    streaming path ships zero keys through the driver).

    Equality deletes make ``snapshot_row_count`` return None (their
    match count is unknown without a scan — that is the point); MERGE,
    ``compact_small_files`` and ``rewrite_snapshot`` FOLD them into
    rewritten files exactly like position deletes, restoring
    metadata-only counts.  A key set whose range touches no live file
    commits nothing (no-op returning the head).  NULL keys never match
    (SQL equality).

    On a ``change_feed=True`` layer the commit records a KEY-ONLY
    change source (``changes.kind = "equality_keys"``): the deleted
    rows' pre-images are NOT scanned at delete time (zero data reads
    hold) — the first CDF read over the range materializes them lazily
    from the (stats-scoped) touched files into a cached parquet, so
    ``snapshot_changes`` / the ``mode=cdf`` stream / IVM refreshes stay
    O(delta) across an equality-delete version instead of falling back
    to the O(table) endpoint diff.
    Returns {"version", "n_keys", "files_in_scope"}.
    """
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    head = versions[-1]
    m = _manifest_raw(spark, path, head)
    txn_map: dict = m.get("txn", {})
    if txn is not None:
        # same idempotence contract as commit/merge: a replayed
        # streaming micro-batch's delete no-ops against the high water
        app, tv = txn
        prev_tv = txn_map.get(app)
        if prev_tv is not None and int(prev_tv) >= int(tv):
            return {
                "version": head,
                "n_keys": 0,
                "files_in_scope": 0,
                "noop": True,
            }
        txn_map = {**txn_map, app: int(tv)}
    schema_rec = m.get("schema") or {}
    if key_col not in schema_rec:
        raise ValueError(
            f"key column {key_col!r} not in layer schema "
            f"{sorted(schema_rec)}"
        )
    ktype = _type_from_json(schema_rec[key_col])
    if isinstance(keys, DataFrame):
        if key_col not in keys.columns:
            raise ValueError(
                f"keys DataFrame lacks key column {key_col!r} "
                f"(has {keys.columns})"
            )
        kdf = (
            keys.select(F.col(key_col).cast(ktype).alias(key_col))
            .filter(F.col(key_col).isNotNull())
            .distinct()
        )
        # ONE tiny job resolves the envelope + cardinality: 3 scalars
        # cross the driver, never the keys themselves
        env = kdf.agg(
            F.min(key_col).alias("__lo"),
            F.max(key_col).alias("__hi"),
            F.count(F.lit(1)).alias("__n"),
        ).first()
        klo, khi, n_keys = env["__lo"], env["__hi"], int(env["__n"])
        if n_keys == 0:
            return {"version": head, "n_keys": 0, "files_in_scope": 0}
    else:
        kvals = [k for k in keys if k is not None]
        _EQ_DELETE_DRIVER_KEYS["n"] += len(kvals)
        if not kvals:
            return {"version": head, "n_keys": 0, "files_in_scope": 0}
        kdf = spark.createDataFrame(
            [(k,) for k in kvals],
            T.StructType([T.StructField(key_col, ktype)]),
        ).distinct()
        klo, khi = min(kvals), max(kvals)
        n_keys = len(set(kvals))
    # two-level metadata-only touch-scope resolution (zero data reads):
    # segment entries by key envelope, then per-file [min, max] ranges
    if m.get("format", 1) >= 2:
        cand_stats: dict = {}
        cand_bases: list[str] = []
        for e in m.get("segments") or []:
            if not _entry_range_keeps(e.get("stats") or {}, key_col, klo, khi):
                continue
            seg = _read_segment(spark, e["path"])
            cand_bases.extend(f.rsplit("/", 1)[-1] for f in seg["files"])
            cand_stats.update(seg.get("stats") or {})
    else:
        cand_bases = [f.rsplit("/", 1)[-1] for f in m["files"]]
        cand_stats = m.get("stats", {})
    ranges = []
    touched: set[str] = set()
    for b in cand_bases:
        s = cand_stats.get(b, {}).get(key_col)
        if s is None:
            touched.add(b)  # no stats: conservatively in scope
        elif s[0] is None or s[1] is None:
            continue  # zero-row / all-NULL file: no key can match
        else:
            ranges.append((b, s[0], s[1]))
    if ranges:
        rdf = spark.createDataFrame(ranges, ["__f", "__lo", "__hi"])
        hit = (
            kdf.select(F.col(key_col).alias("__k"))
            .join(
                F.broadcast(rdf),
                (F.col("__k") >= F.col("__lo"))
                & (F.col("__k") <= F.col("__hi")),
            )
            .select("__f")
            .distinct()
            .collect()
        )
        touched.update(r["__f"] for r in hit)
    if not touched:
        return {"version": head, "n_keys": 0, "files_in_scope": 0}
    version = head + 1
    key_dir = f"{path}/deletes/v{version}-{uuid.uuid4().hex[:8]}"
    # sidecar written FROM THE EXECUTORS; file count scales with the key
    # volume (coalesce is a narrow dependency — no shuffle)
    kdf.coalesce(max(1, min(32, n_keys // 2_000_000 + 1))).write.mode(
        "error"
    ).parquet(key_dir)
    # CHANGE DATA FEED: record a KEY-ONLY change source — the commit
    # still reads zero data files; the deleted rows' pre-images
    # materialize lazily (O(touched files), once) on the first CDF read
    # over this version, into the deterministic cache dir named here
    cdf_entry = None
    if m.get("cdf"):
        cdf_entry = {
            "kind": "equality_keys",
            "keys_path": key_dir,
            "key_col": key_col,
            "touches": sorted(touched),
            "path": f"{path}/_changes/v{version}-eqpre",
        }
    if m.get("format", 1) >= 2:
        seg_entries = m.get("segments") or []
    else:
        seg_entries = _entries_from_inline(
            spark, path, version, _manifest(spark, path, head)
        )
    _write_text(
        spark,
        f"{path}/{_MANIFEST_DIR}/v{version}.json",
        json.dumps(
            {
                "version": version,
                "committed_at": time.time(),
                "mode": "delete",
                "format": 2,
                "segments": seg_entries,
                "bloom_col": m.get("bloom_col"),
                "bloom_m": m.get("bloom_m"),
                "bloom_k": m.get("bloom_k"),
                "delete_files": (m.get("delete_files") or [])
                + [
                    {
                        "path": key_dir,
                        "kind": "equality",
                        "key_col": key_col,
                        "touches": sorted(touched),
                    }
                ],
                "schema": m.get("schema"),
                "checks": m.get("checks") or {},
                "stat_doms": m.get("stat_doms"),
                "cdf": bool(m.get("cdf")),
                "partition_spec": m.get("partition_spec"),
                "partition_specs_all": m.get("partition_specs_all")
                or m.get("partition_spec"),
                "changes": cdf_entry,
                "txn": txn_map,
            },
            default=str,
        ),
    )
    return {
        "version": version,
        "n_keys": n_keys,
        "files_in_scope": len(touched),
    }


def snapshot_row_count(
    spark: SparkSession, path: str, version: int | None = None
) -> int | None:
    """Exact row count of one version from the MANIFEST ALONE — no data
    scan, no footer reads (the Delta/Iceberg numRecords fast path; at
    100 TB a COUNT(*) that opens zero files is the difference between
    milliseconds and a cluster-wide scan).  Per-file counts are recorded
    by the commit-time stats pass; position-delete counts subtract
    exactly because the delete scan never re-marks an already-deleted
    row.  Returns None when the manifest predates count recording (or a
    file lacks a count) — the caller falls back to a real count."""
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions} at {path}")
    m = _manifest_raw(spark, path, v)
    if m.get("format", 1) >= 2:
        # pure segment-entry arithmetic — ZERO segment reads, zero data
        # scans.  Sound because every mutator maintains the invariant
        # that delete-entry touches reference only files live in the
        # same manifest (appends carry entries verbatim over a growing
        # file set; merge/compact trim rewritten bases out)
        entries = m.get("segments") or []
        if any(e.get("n_rows") is None for e in entries):
            return None
        if any(
            e.get("kind") == "equality" for e in m.get("delete_files") or []
        ):
            # an equality delete's match count is unknown without a scan
            # (that is its point: O(keys) metadata, no data read) — the
            # manifest cannot answer exactly until compaction folds it
            return None
        total = sum(int(e["n_rows"]) for e in entries)
        for e in m.get("delete_files") or []:
            total -= sum(int(n) for n in e["touches"].values())
        return total
    counts = m.get("counts")
    if not counts:
        return None
    if any(e.get("kind") == "equality" for e in m.get("delete_files") or []):
        return None
    bases = [f.rsplit("/", 1)[-1] for f in m["files"]]
    if any(b not in counts for b in bases):
        return None
    total = sum(int(counts[b]) for b in bases)
    live = set(bases)
    for e in m.get("delete_files") or []:
        # entries may reference files a later MERGE rewrote; only files
        # still in this version's list carry their deletions
        total -= sum(int(n) for b, n in e["touches"].items() if b in live)
    return total


def snapshot_table_bytes(
    spark: SparkSession, path: str, version: int | None = None
) -> int | None:
    """Total data bytes of one version from SEGMENT-ENTRY ARITHMETIC —
    zero segment reads, zero file RPCs.  None when any entry predates
    size recording (or the manifest is format 1) — the caller falls
    back to a listing or skips the size-based decision."""
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions} at {path}")
    m = _manifest_raw(spark, path, v)
    if m.get("format", 1) < 2:
        return None
    entries = m.get("segments") or []
    if any(e.get("bytes") is None for e in entries):
        return None
    return sum(int(e["bytes"]) for e in entries)


def snapshot_table_raw_bytes(
    spark: SparkSession, path: str, version: int | None = None
) -> int | None:
    """Total LOGICAL (in-memory) data bytes of one version from
    segment-entry arithmetic — per-file figures recorded by the
    commit-time stats scan (``_logical_size_expr``: fixed widths +
    octet lengths + row overhead).  The honest input for
    will-this-fit-in-memory decisions: compressed parquet bytes (and
    even the footers' "uncompressed" page sizes, which are
    dictionary/RLE-encoded) understate a broadcast's build side by
    3-10x on columnar-friendly data.  None when any entry predates
    raw-size recording (callers fall back to compressed bytes times a
    documented expansion factor)."""
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions} at {path}")
    m = _manifest_raw(spark, path, v)
    if m.get("format", 1) < 2:
        return None
    entries = m.get("segments") or []
    if any(e.get("raw_bytes") is None for e in entries):
        return None
    return sum(int(e["raw_bytes"]) for e in entries)


def snapshot_col_stats(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    cols: list[str] | None = None,
) -> dict:
    """ANALYZE-lite table statistics from the MANIFEST ALONE (metadata
    reads only, no data scans): {"n_rows", "bytes", "columns": {col:
    {"ndv", "nulls"}}} for every stats column recorded at commit time
    (or the requested subset).

    NDV comes from UNIONING the per-file HLL sketches across all live
    files — ONE tiny Spark job over O(files) kilobyte binaries, exact
    union semantics (Datasketches), so the estimate is as good as a full
    rescan at ~2% relative error however the layer was assembled.  Null
    counts are additive.  A column some live file lacks sketches for
    reports None (honest partial coverage — e.g. files written before
    the column joined ``stats_cols``).  n_rows/bytes fall back to None
    exactly like ``snapshot_row_count``/``snapshot_table_bytes``.

    These are the inputs a join planner needs: build-side size for
    broadcast decisions (``register_snapshot_view(auto_broadcast=...)``
    consumes it) and key NDV for selectivity/skew estimates."""
    import base64

    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    v = versions[-1] if version is None else version
    m = _manifest(spark, path, v)  # materialized: needs per-file colmeta
    colmeta = m.get("colmeta") or {}
    bases = [f.rsplit("/", 1)[-1] for f in m["files"]]
    all_cols: set[str] = set()
    for b in bases:
        all_cols.update(colmeta.get(b) or {})
    want = sorted(all_cols if cols is None else set(cols))
    out_cols: dict = {}
    union_jobs: list[tuple[str, list[bytes]]] = []
    for c in want:
        per_file = [(colmeta.get(b) or {}).get(c) for b in bases]
        if any(cm is None for cm in per_file):
            out_cols[c] = {"ndv": None, "nulls": None}
            continue
        # sketches recorded pre-domain-tagging were string-cast
        if len({cm.get("dom", "string") for cm in per_file}) > 1:
            # mixed hash domains cannot union soundly — honest None
            out_cols[c] = {
                "ndv": None,
                "nulls": sum(int(cm["nulls"]) for cm in per_file),
            }
            continue
        nulls = sum(int(cm["nulls"]) for cm in per_file)
        sketches = [
            base64.b64decode(cm["hll"])
            for cm in per_file
            if cm["hll"] is not None
        ]
        out_cols[c] = {"ndv": 0, "nulls": nulls}
        if sketches:
            union_jobs.append((c, sketches))
    if union_jobs:
        # one local-relation job unions every column's sketches at once
        rows = [
            (c, sk) for c, sketches in union_jobs for sk in sketches
        ]
        est = (
            spark.createDataFrame(rows, "c string, s binary")
            .groupBy("c")
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("s")).alias("ndv")
            )
            .collect()
        )
        for r in est:
            out_cols[r["c"]]["ndv"] = int(r["ndv"])
    return {
        "n_rows": snapshot_row_count(spark, path, v),
        "bytes": snapshot_table_bytes(spark, path, v),
        "columns": out_cols,
    }


def register_snapshot_view(
    spark: SparkSession,
    path: str,
    name: str,
    version: int | None = None,
    *,
    as_of: float | None = None,
    auto_broadcast_bytes: int | None = None,
) -> None:
    """SQL façade: expose one version of the layer as a temp view, so
    ``spark.sql("SELECT ... FROM name")`` composes the whole SQL
    surface (joins, windows, CTEs) over the manifest-planned,
    deletion-vector-aware read.  Re-registering replaces the view (a
    view pins the version resolved AT registration — re-register to
    follow the head).

    ``auto_broadcast_bytes=N`` makes the registration STATS-DRIVEN: when
    the manifest's recorded total data size (segment-entry arithmetic,
    zero IO) is at or under N, the view carries a broadcast hint, so
    every join against it hash-broadcasts regardless of Spark's own
    (often blind) size estimate.  Why this matters at 100 TB: Spark
    estimates build-side size from FILE bytes it can see at plan time;
    through a manifest-planned multi-parquet read with deletion vectors
    the estimate degrades to worst-case and a 5 MB dimension falls back
    to a sort-merge join with a full shuffle of the fact side.  The
    manifest KNOWS the size — this is Delta/Iceberg's stats-based join
    planning.  A layer without recorded sizes (format 1) never hints —
    stats-driven means never guessing.

    The size compared is the UNCOMPRESSED total
    (``snapshot_table_raw_bytes``, recorded from the parquet footers at
    commit): columnar compression means on-disk bytes can understate a
    broadcast's in-memory build side by 3-10x, so a "fits in 10 MB"
    decision on compressed bytes could materialize a 100 MB hash per
    executor at scale (VERDICT r6 #6).  Layers predating raw-size
    recording fall back to compressed bytes times a conservative
    documented 4x expansion factor."""
    if as_of is not None and version is None:
        version = snapshot_version_as_of(spark, path, as_of)
        as_of = None
    df = read_snapshot(spark, path, version, as_of=as_of)
    if auto_broadcast_bytes is not None:
        total = snapshot_table_raw_bytes(spark, path, version)
        if total is None:
            comp = snapshot_table_bytes(spark, path, version)
            total = comp * 4 if comp is not None else None
        if total is not None and total <= auto_broadcast_bytes:
            df = df.hint("broadcast")
    df.createOrReplaceTempView(name)


def snapshot_version_as_of(
    spark: SparkSession, path: str, ts_epoch: float
) -> int:
    """TIMESTAMP AS OF resolution (the Delta/Iceberg twin of VERSION AS
    OF): the newest version whose manifest ``committed_at`` is at or
    before ``ts_epoch``.  Commit timestamps are recorded at manifest
    write; manifests from before timestamp recording count as epoch 0
    (always eligible, preserving old layers).  Raises when every
    surviving version is newer than the asked instant — including when
    the one that WAS current then has been vacuumed, which is the honest
    answer (the bytes are gone)."""
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    eligible = [
        v
        for v in versions
        if float(_manifest(spark, path, v).get("committed_at") or 0)
        <= ts_epoch
    ]
    if not eligible:
        raise FileNotFoundError(
            f"no version at or before epoch {ts_epoch} survives at {path} "
            "(it may have been vacuumed)"
        )
    return eligible[-1]


def snapshot_history(spark: SparkSession, path: str) -> DataFrame:
    """DESCRIBE HISTORY for the layer: one row per surviving version —
    (version, mode, n_files, n_rows, n_delete_entries, committed_at,
    restore_of).  ``restore_of`` completes the audit story for
    rollbacks: a RESTORE commit names the version whose content it
    reinstated (NULL for every other mode), so "which state was current
    after the rollback" is answerable from history alone.  Metadata-only
    (manifest JSON; ``n_rows`` via the same per-file counts as
    ``snapshot_row_count``, NULL where a manifest predates count
    recording); row count is bounded by the version count, so the
    driver-side materialization is audit-log-sized, never data-sized."""
    rows = []
    for v in snapshot_versions(spark, path):
        m = _manifest_raw(spark, path, v)
        try:
            n_rows = snapshot_row_count(spark, path, v)
        except FileNotFoundError:
            n_rows = None
        if m.get("format", 1) >= 2:
            n_files = sum(
                int(e["n_files"]) for e in m.get("segments") or []
            )
        else:
            n_files = len(m["files"])
        rows.append(
            (
                v,
                m.get("mode"),
                n_files,
                n_rows,
                len(m.get("delete_files") or []),
                float(m["committed_at"]) if m.get("committed_at") else None,
                int(m["restore_of"]) if m.get("restore_of") else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "version int, mode string, n_files int, n_rows long, "
        "n_delete_entries int, committed_at double, restore_of int",
    )


def snapshot_append_delta(
    spark: SparkSession, path: str, v_from: int, v_to: int
) -> DataFrame:
    """Change-feed SPECIALIZATION for append-only version ranges: the
    rows added between ``v_from`` and ``v_to`` are exactly the files in
    ``v_to``'s manifest that ``v_from``'s lacks — a manifest SET
    DIFFERENCE, so the delta reads O(delta files) with ZERO comparison
    compute, where the generic ``snapshot_changes`` pays two full-table
    ``exceptAll`` shuffles.  This is what makes incremental view
    maintenance over a streaming-ingest layer O(new data) end to end.

    Guarded, not assumed: every intermediate version's mode must be
    'append' and the deletion-vector entries must be unchanged —
    otherwise file difference is not row difference and the generic
    feed is the correct tool (the error says so)."""
    versions = snapshot_versions(spark, path)
    for v in (v_from, v_to):
        if v not in versions:
            raise FileNotFoundError(f"version {v} not in {versions} at {path}")
    if v_to < v_from:
        raise ValueError(f"v_to {v_to} < v_from {v_from}")
    m_from = _manifest_raw(spark, path, v_from)
    m_to = _manifest_raw(spark, path, v_to)
    for v in range(v_from + 1, v_to + 1):
        mode = _manifest_raw(spark, path, v).get("mode")
        if mode != "append":
            raise ValueError(
                f"version {v} has mode {mode!r}, not 'append' — file "
                "difference is not row difference; use snapshot_changes"
            )
    dv_from = [e["path"] for e in m_from.get("delete_files") or []]
    dv_to = [e["path"] for e in m_to.get("delete_files") or []]
    if dv_from != dv_to:
        raise ValueError(
            "deletion vectors changed across the range — use "
            "snapshot_changes"
        )
    if m_from.get("format", 1) >= 2 and m_to.get("format", 1) >= 2:
        # SEGMENT set difference: appends carry the prior entries by
        # reference, so the delta is exactly v_to's new segment entries
        # — only THOSE segment files are read, O(delta) end to end even
        # on a 10^7-file layer
        from_paths = {e["path"] for e in m_from.get("segments") or []}
        new_files = sorted(
            f
            for e in m_to.get("segments") or []
            if e["path"] not in from_paths
            for f in _read_segment(spark, e["path"])["files"]
        )
    else:
        # a format migration inside the range: fall back to the
        # materialized file-set difference (one-time cost)
        new_files = sorted(
            set(_manifest(spark, path, v_to)["files"])
            - set(_manifest(spark, path, v_from)["files"])
        )
    if not new_files:
        rec = m_to.get("schema")
        schema = T.StructType(
            [
                T.StructField(name, _type_from_json(dtype))
                for name, dtype in (rec or {}).items()
            ]
        )
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*new_files)


def restore_snapshot(spark: SparkSession, path: str, version: int) -> int:
    """ROLLBACK as a new commit (Delta RESTORE): make the head's content
    equal to ``version`` by committing a NEW manifest that references
    the old version's exact file set, stats, blooms and deletion
    vectors — zero data movement, and the botched intermediate versions
    stay in history for audit (this is *not* a destructive rewind).

    Writer transaction high-water marks are carried from the CURRENT
    head, not the restored version: a streaming batch that committed
    after ``version`` must still replay as a no-op after the restore —
    rolling the txn map back would let the sink double-ingest it.

    Fails up front, naming the missing files, when the target version's
    data has already been vacuumed (the honest answer; a scan-time
    surprise helps nobody)."""
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    if version not in versions:
        raise FileNotFoundError(
            f"version {version} not in {versions} at {path}"
            + (
                " (older versions may have been vacuumed)"
                if versions and version < versions[0]
                else ""
            )
        )
    head = versions[-1]
    old_raw = _manifest_raw(spark, path, version)
    cur = _manifest_raw(spark, path, head)
    jvm, fs = _fs(spark, path)
    # SEGMENT paths are checked from the RAW manifest, BEFORE
    # materializing: _manifest reads every segment file, so a vacuumed
    # segment (e.g. the source of a clone GC'd under it) would die
    # inside _read_text with an opaque py4j FileNotFound before the
    # friendly error below could ever fire
    missing = [
        e["path"]
        for e in old_raw.get("segments") or []
        if not fs.exists(_hpath(jvm, e["path"]))
    ]
    if not missing:
        old = _manifest(spark, path, version)
        missing = [
            f
            for f in old["files"]
            + [e["path"] for e in old.get("delete_files") or []]
            if not fs.exists(_hpath(jvm, f))
        ]
    if missing:
        raise FileNotFoundError(
            f"cannot restore v{version}: {len(missing)} referenced "
            f"file(s) vacuumed, e.g. {missing[0]}"
        )
    new_v = head + 1
    if old_raw.get("format", 1) >= 2:
        seg_entries = old_raw.get("segments") or []
    else:
        seg_entries = _entries_from_inline(spark, path, new_v, old)
    _write_text(
        spark,
        f"{path}/{_MANIFEST_DIR}/v{new_v}.json",
        json.dumps(
            {
                "version": new_v,
                "committed_at": time.time(),
                "mode": "restore",
                "format": 2,
                "restore_of": version,
                "segments": seg_entries,
                "bloom_col": old.get("bloom_col"),
                "bloom_m": old.get("bloom_m"),
                "bloom_k": old.get("bloom_k"),
                "delete_files": old.get("delete_files") or [],
                "schema": old.get("schema"),
                "checks": old.get("checks") or {},
                "stat_doms": old_raw.get("stat_doms"),
                "cdf": bool(old.get("cdf")),
                "partition_spec": old_raw.get("partition_spec"),
                "partition_specs_all": old_raw.get("partition_specs_all")
                or old_raw.get("partition_spec"),
                "txn": cur.get("txn", {}),  # never roll back idempotence
            },
            default=str,
        ),
    )
    return new_v


def clone_snapshot(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    version: int | None = None,
) -> int:
    """SHALLOW CLONE (Delta semantics): commit version 1 of a NEW layer
    at ``dst_path`` whose manifest references the SOURCE version's data
    files and deletion vectors in place — zero bytes copied, however
    large the table.  The clone then evolves independently: appends
    stage under the clone's own directories, and a copy-on-write MERGE
    rewrites touched source files INTO the clone, never back into the
    source.  Writer txn marks reset (a clone is a new table).

    Caveat, same as Delta's: the clone references the source's files,
    so vacuuming the SOURCE can break the clone — retention policy must
    cover live clones.  The clone's own vacuum only touches its own
    directories and can never harm the source."""
    if snapshot_versions(spark, dst_path):
        raise FileExistsError(f"clone target {dst_path} already has commits")
    versions = snapshot_versions(spark, src_path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {src_path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions} at {src_path}")
    m = _manifest_raw(spark, src_path, v)
    if m.get("format", 1) >= 2:
        # the clone references the SOURCE's segment files in place, like
        # its data files — zero bytes copied; the clone's own vacuum
        # lists only its own _manifests/segments dir, so it can never
        # GC the source's segments (same caveat as data: vacuuming the
        # SOURCE can break the clone)
        seg_entries = m.get("segments") or []
    else:
        seg_entries = _entries_from_inline(
            spark, dst_path, 1, _manifest(spark, src_path, v)
        )
    _write_text(
        spark,
        f"{dst_path}/{_MANIFEST_DIR}/v1.json",
        json.dumps(
            {
                "version": 1,
                "committed_at": time.time(),
                "mode": "clone",
                "clone_of": {"path": src_path, "version": v},
                "format": 2,
                "segments": seg_entries,
                "bloom_col": m.get("bloom_col"),
                "bloom_m": m.get("bloom_m"),
                "bloom_k": m.get("bloom_k"),
                "delete_files": m.get("delete_files") or [],
                "schema": m.get("schema"),
                "checks": m.get("checks") or {},
                "stat_doms": m.get("stat_doms"),
                "cdf": bool(m.get("cdf")),
                "partition_spec": m.get("partition_spec"),
                "partition_specs_all": m.get("partition_specs_all")
                or m.get("partition_spec"),
                "txn": {},
            },
            default=str,
        ),
    )
    return 1


_PIN_DIR = f"{_MANIFEST_DIR}/pins"


def _pin_file(ref: str) -> str:
    import hashlib

    return hashlib.md5(ref.encode()).hexdigest() + ".json"


def pin_snapshot_version(
    spark: SparkSession, path: str, version: int, *, ref: str
) -> dict:
    """Record a BACK-REFERENCE on this layer: some other layer (``ref``,
    typically a shallow clone / WAP branch path) references version
    ``version``'s data files in place, so retention GC must keep that
    version alive until the pin is released.  ``vacuum_snapshots``
    consults pins (a pinned version joins the keep set) and
    ``drop_snapshot_layer`` refuses to delete a pinned layer without
    ``force=True`` — without this record, a published WAP branch's
    dependency on its retired source is invisible and a routine vacuum
    silently corrupts the published table.

    Idempotent per ``ref`` (deterministic filename — a re-pin from the
    same clone overwrites its own record).  Returns the pin record."""
    versions = snapshot_versions(spark, path)
    if int(version) not in versions:
        raise FileNotFoundError(
            f"cannot pin version {version}: not in {versions} at {path}"
        )
    rec = {"version": int(version), "ref": str(ref), "created_at": time.time()}
    # _write_text's rename-no-overwrite lock is for version manifests;
    # a pin is keyed BY ref, so the same ref re-pinning (clone rebuilt
    # against a newer source version) replaces its own record
    jvm, fs = _fs(spark, path)
    fs.delete(_hpath(jvm, f"{path}/{_PIN_DIR}/{_pin_file(ref)}"), False)
    _write_text(spark, f"{path}/{_PIN_DIR}/{_pin_file(ref)}", json.dumps(rec))
    return rec


def snapshot_pins(spark: SparkSession, path: str) -> list[dict]:
    """All live back-reference pins on this layer (empty when none)."""
    jvm, fs = _fs(spark, path)
    d = _hpath(jvm, f"{path}/{_PIN_DIR}")
    if not fs.exists(d):
        return []
    out = []
    for status in fs.listStatus(d):
        name = status.getPath().getName()
        if name.endswith(".json") and ".tmp-" not in name:
            out.append(
                json.loads(_read_text(spark, f"{path}/{_PIN_DIR}/{name}"))
            )
    return sorted(out, key=lambda r: (r["version"], r["ref"]))


def snapshot_external_refs(spark: SparkSession, path: str) -> list[str]:
    """Data/delete/segment file paths referenced by ANY surviving
    manifest of this layer that live OUTSIDE the layer's own directory
    — non-empty exactly while the layer is (still) a shallow clone
    depending on another layer's files.  The release gate for a
    back-reference pin: a clone that rewrote its head but keeps
    pre-rewrite history is NOT yet independent (time travel still
    resolves the source's files)."""
    import os

    base = os.path.normpath(
        str(path).removeprefix("file://").removeprefix("file:")
    )
    out: set[str] = set()
    for v in snapshot_versions(spark, path):
        raw = _manifest_raw(spark, path, v)
        m = _manifest(spark, path, v)
        refs = list(m.get("files") or [])
        refs += [e["path"] for e in m.get("delete_files") or []]
        refs += [e["path"] for e in raw.get("segments") or []]
        ch = m.get("changes")
        if ch:
            refs.append(ch["path"])
        for f in refs:
            fp = os.path.normpath(
                str(f).removeprefix("file://").removeprefix("file:")
            )
            if not fp.startswith(base + os.sep):
                out.add(str(f))
    return sorted(out)


def unpin_snapshot_version(spark: SparkSession, path: str, *, ref: str) -> bool:
    """Release ``ref``'s pin (the clone was retired/rewritten to own its
    files).  Returns True if a pin existed."""
    jvm, fs = _fs(spark, path)
    p = _hpath(jvm, f"{path}/{_PIN_DIR}/{_pin_file(ref)}")
    if not fs.exists(p):
        return False
    fs.delete(p, False)
    return True


def snapshot_minmax(
    spark: SparkSession, path: str, col: str, version: int | None = None
) -> tuple | None:
    """Exact MIN/MAX of ``col`` for one version from the MANIFEST ALONE
    — the aggregate-pushdown-to-metadata fast path (Spark's own parquet
    aggregate pushdown does this per footer; here it is zero opens of
    any kind).  Sound because per-file [min, max] are exact over the
    file's rows and MIN/MAX distribute over the file union.

    Returns None when it CANNOT answer exactly: a file without recorded
    stats for ``col``, or any live position-delete entry (a deleted row
    could be the extremum — merge-on-read makes file stats upper
    bounds, so the caller must fall back to a real scan).  A version
    whose every file is empty/all-NULL returns (None, None), matching
    SQL MIN/MAX over no rows."""
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions} at {path}")
    m = _manifest_raw(spark, path, v)
    if m.get("delete_files"):
        return None
    if m.get("format", 1) >= 2:
        # fold the SEGMENT-entry aggregates — zero segment reads.  An
        # entry lacking the column means some member file has no stats
        # for it (the entry-level contract), so the answer cannot be
        # exact and the caller must scan
        lo = hi = None
        for e in m.get("segments") or []:
            s = (e.get("stats") or {}).get(col)
            if s is None:
                return None
            if s[0] is None or s[1] is None:
                continue
            lo = s[0] if lo is None or s[0] < lo else lo
            hi = s[1] if hi is None or s[1] > hi else hi
        return (lo, hi)
    stats = m.get("stats", {})
    lo = hi = None
    for f in m["files"]:
        s = stats.get(f.rsplit("/", 1)[-1], {}).get(col)
        if s is None:
            return None  # a file without stats: cannot answer exactly
        if s[0] is None or s[1] is None:
            continue  # zero rows / all NULL contributes nothing
        lo = s[0] if lo is None or s[0] < lo else lo
        hi = s[1] if hi is None or s[1] > hi else hi
    return (lo, hi)


# observability hook: tests pin that CDF-covered ranges never pay the
# generic two-exceptAll fallback (the O(table) path)
_CDF_FALLBACKS = {"n": 0}
# keys that crossed the driver via the delete_snapshot_keys LIST path —
# the DataFrame path adds nothing here; tests pin that the streaming CDC
# sink ships zero delete keys through the driver
_EQ_DELETE_DRIVER_KEYS = {"n": 0}
# lazy equality-delete pre-image materializations actually COMPUTED
# (cache misses) — tests pin that repeat CDF reads hit the cache
_EQ_PREIMAGE_BUILDS = {"n": 0}


def _materialize_eq_preimage(
    spark: SparkSession, path: str, v: int, ch: dict, prev_m: dict
) -> DataFrame:
    """Pre-images of the rows an equality-key DELETE (version ``v``)
    removed, materialized LAZILY on first CDF read: the delete commit
    itself read zero data files and recorded only the key sidecar plus
    its stats-resolved touch scope (``ch`` — the manifest's
    ``changes.kind == "equality_keys"`` entry); here the TOUCHED files
    (never the table) are read as of ``v-1`` (the previous manifest's
    delete entries applied, restricted to those files), semi-joined
    against the broadcast key set, and written once to the
    deterministic cache dir the manifest named at commit time — so the
    first read over the range pays O(touched files) and every later
    ``snapshot_changes`` / CDF-stream / IVM refresh reads the O(delta)
    parquet like any other per-commit change file.  The cache write is
    a stage-and-rename (a racing reader's loser deletes its temp and
    serves the winner's cache); ``vacuum_snapshots`` keeps the cache
    while the manifest survives, and a vacuumed cache just re-pays the
    one O(touched) materialization."""
    jvm, fs = _fs(spark, path)
    final = ch["path"]
    if fs.exists(_hpath(jvm, final)):
        return spark.read.parquet(final)
    _EQ_PREIMAGE_BUILDS["n"] += 1
    touched = set(ch["touches"])
    files = [
        f
        for f in snapshot_files(spark, path, v)
        if f.rsplit("/", 1)[-1] in touched
    ]
    base_expr = F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
    # mergeSchema: touched files may span schema evolutions, and the
    # change feed must carry the full evolved pre-image rows
    df = spark.read.option("mergeSchema", "true").parquet(*files).select(
        "*",
        base_expr.alias("__dv_file"),
        F.col("_metadata.row_index").alias("__dv_pos"),
    )
    prev_entries = prev_m.get("delete_files") or []
    if prev_entries:
        # v-1 state of the touched files: rows already deleted before
        # this commit were not deleted BY it
        pos_dirs, eq, _ = _split_delete_entries(prev_entries, touched)
        df = _apply_deletes_meta(spark, df, pos_dirs, eq)
    keys = (
        spark.read.parquet(ch["keys_path"]).select(ch["key_col"]).distinct()
    )
    pre = (
        df.join(F.broadcast(keys), ch["key_col"], "left_semi")
        .drop("__dv_file", "__dv_pos")
        .withColumn("change_type", F.lit("delete"))
    )
    # dot-prefixed temp: invisible to Spark's file index, GC'd by vacuum
    tmp = f"{path}/_changes/.tmp-v{v}-{uuid.uuid4().hex[:8]}"
    pre.write.mode("error").parquet(tmp)
    if fs.exists(_hpath(jvm, final)) or not fs.rename(
        _hpath(jvm, tmp), _hpath(jvm, final)
    ):
        # lost the materialization race: the winner's cache serves
        fs.delete(_hpath(jvm, tmp), True)
    return spark.read.parquet(final)


def _changes_from_commits(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    versions: list[int],
) -> DataFrame | None:
    """O(changed rows) change feed from per-commit change sources:
    appends contribute their new files (manifest SEGMENT diff — only
    the delta's segment files are even opened), merge/predicate-delete
    commits contribute their recorded change files, equality-key
    deletes their lazily-materialized (then cached) pre-images,
    compactions contribute nothing (row-content-neutral).  Returns None
    when ANY step lacks a source (overwrite, restore, pre-CDF merges
    and equality deletes, a vacuumed intermediate version, or a
    format-1 boundary) — the caller then falls back to the generic
    diff."""
    steps = [v for v in versions if v_from < v <= v_to]
    if steps != list(range(v_from + 1, v_to + 1)):
        return None  # an intermediate version was vacuumed
    prev_m = _manifest_raw(spark, path, v_from)
    out: DataFrame | None = None
    for v in steps:
        m = _manifest_raw(spark, path, v)
        mode = m.get("mode")
        step: DataFrame | None
        if mode == "append":
            if prev_m.get("format", 1) < 2 or m.get("format", 1) < 2:
                return None  # format boundary: segment diff unavailable
            if [e["path"] for e in prev_m.get("delete_files") or []] != [
                e["path"] for e in m.get("delete_files") or []
            ]:
                return None  # defensive: appends never change DVs
            prev_paths = {e["path"] for e in prev_m.get("segments") or []}
            new_files = sorted(
                f
                for e in m.get("segments") or []
                if e["path"] not in prev_paths
                for f in _read_segment(spark, e["path"])["files"]
            )
            step = (
                spark.read.option("mergeSchema", "true")
                .parquet(*new_files)
                .withColumn("change_type", F.lit("insert"))
                if new_files
                else None
            )
        elif mode == "compact":
            step = None  # same rows, fewer files
        elif mode in ("merge", "delete") and m.get("changes"):
            ch = m["changes"]
            if ch.get("kind") == "equality_keys":
                # key-only change source: pre-images materialize lazily
                # from the touched files (cached after the first read)
                step = _materialize_eq_preimage(spark, path, v, ch, prev_m)
            else:
                step = spark.read.parquet(ch["path"])
        else:
            return None
        if step is not None:
            out = (
                step
                if out is None
                else out.unionByName(step, allowMissingColumns=True)
            )
        prev_m = m
    if out is not None:
        return out
    # every step contributed nothing: typed empty feed from the
    # endpoint's recorded schema
    rec = _manifest_raw(spark, path, v_to).get("schema") or {}
    schema = T.StructType(
        [
            T.StructField(name, _type_from_json(dtype))
            for name, dtype in rec.items()
        ]
        + [T.StructField("change_type", T.StringType())]
    )
    return spark.createDataFrame([], schema)


def snapshot_changes(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    *,
    force_generic: bool = False,
) -> DataFrame:
    """Exact change feed between two committed versions: full rows with a
    ``change_type`` column ('insert' / 'delete'), multiset semantics, so
    updates surface as one delete plus one insert.

    **Routing (Delta CDF semantics).**  When every step in
    ``(v_from, v_to]`` has an O(delta) change source — an append
    (manifest segment diff), a compaction (row-neutral), a
    merge/predicate-DELETE commit that recorded a change file (enable
    with ``commit_snapshot(change_feed=True)``), or an equality-key
    DELETE on a change-feed layer (key-only change source; pre-images
    materialize lazily from the touched files and cache) — the feed is
    the CONCATENATION of the per-step exact deltas: O(changed rows) end
    to end, ZERO table scans.  Each per-step delta is an exact net (an
    upsert of an identical row cancels out), but across steps a row
    inserted then deleted appears as a cancelling insert+delete pair —
    consumers fold signed (+1 insert / −1 delete), exactly what every
    IVM refresh does, and the fold equals the endpoint diff.

    Any step WITHOUT a change source (overwrite, restore, pre-CDF
    merges and equality deletes, a vacuumed intermediate version) falls
    back to the generic endpoint diff: two full-row ``exceptAll`` set
    differences — the no-cooperation contract, whose output is the
    strict endpoint net with no cancelling pairs.  ``force_generic``
    pins that path (tests, or when strict endpoint-net output matters).
    """
    versions = snapshot_versions(spark, path)
    for v in (v_from, v_to):
        if v not in versions:
            raise FileNotFoundError(
                f"version {v} not in {versions} at {path}"
            )
    if v_to < v_from:
        raise ValueError(f"v_to {v_to} < v_from {v_from}")
    if not force_generic:
        feed = _changes_from_commits(spark, path, v_from, v_to, versions)
        if feed is not None:
            return feed
    _CDF_FALLBACKS["n"] += 1
    before = read_snapshot(spark, path, v_from)
    after = read_snapshot(spark, path, v_to)
    return (
        after.exceptAll(before)
        .withColumn("change_type", F.lit("insert"))
        .unionByName(
            before.exceptAll(after).withColumn("change_type", F.lit("delete"))
        )
    )


#: callables invoked with the dropped path by ``drop_snapshot_layer`` —
#: process-local caches keyed on layer paths register here, because a
#: drop + recreate at the SAME path restarts versions at 1 and a
#: (path, version) cache would silently serve the old layer's state
_DROP_LAYER_HOOKS: list = []


def register_drop_layer_hook(fn) -> None:
    """Register ``fn(path)`` to run after every ``drop_snapshot_layer``
    (idempotent per function object)."""
    if fn not in _DROP_LAYER_HOOKS:
        _DROP_LAYER_HOOKS.append(fn)


def drop_snapshot_layer(
    spark: SparkSession, path: str, *, force: bool = False
) -> None:
    """Delete the whole layer (test/rebuild hygiene), then notify
    registered cache-invalidation hooks — dropping a PARENT directory
    drops every nested layer, so hooks match on path prefix.

    A layer carrying back-reference pins (live shallow clones / WAP
    branches referencing its files in place — see
    ``pin_snapshot_version``) refuses to drop unless ``force=True``:
    deleting it would silently corrupt the dependents."""
    jvm, fs = _fs(spark, path)
    if not force:
        try:
            pins = snapshot_pins(spark, path)
        except Exception:
            pins = []
        if pins:
            raise RuntimeError(
                f"drop refused: {path} is pinned by live dependents "
                f"{[p['ref'] for p in pins]} (shallow clones referencing "
                "its data files in place) — unpin_snapshot_version them "
                "first or pass force=True"
            )
    fs.delete(_hpath(jvm, path), True)
    _evict_json_cache(path)
    for fn in _DROP_LAYER_HOOKS:
        fn(path)


def snapshot_changes_keyed(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
    *,
    include_values: bool = False,
) -> DataFrame:
    """Keyed change feed: with a declared primary key the diff is ONE
    full-outer equi-join on the key instead of two full-row set
    differences — the cheaper specialization when rows are wide (the
    shuffle moves key + change flag logic, and updates surface as a
    single 'update' row instead of delete+insert).

    Emits (key_cols..., change_type) with change_type in
    insert/delete/update; unchanged keys are dropped.  Assumes the key
    is unique per version (the caller's contract, as in any MERGE).
    ``include_values=True`` adds ``before``/``after`` structs of the
    non-key columns (NULL on the missing side) — the payload a keyed
    incremental view maintenance fold consumes.

    Versions with EVOLVED schemas diff correctly: both sides read with
    ``merge_schema=True`` and align to the union of their columns (a
    column one version lacks reads NULL there), so a column added by an
    append surfaces as an 'update' on rows whose new column is non-NULL
    instead of raising an AnalysisException.
    """
    before = read_snapshot(spark, path, v_from, merge_schema=True)
    after = read_snapshot(spark, path, v_to, merge_schema=True)
    non_key = [c for c in after.columns if c not in key_cols]
    non_key += [
        c for c in before.columns if c not in key_cols and c not in non_key
    ]
    # NULL fills are CAST to the column's type on the side that has it, so
    # the two comparison structs stay type-identical
    types = {f.name: f.dataType for f in before.schema.fields}
    types.update({f.name: f.dataType for f in after.schema.fields})

    def _aligned(df: DataFrame) -> DataFrame:
        cols = [
            F.col(c)
            if c in df.columns
            else F.lit(None).cast(types[c]).alias(c)
            for c in (*key_cols, *non_key)
        ]
        return df.select(*cols)

    before, after = _aligned(before), _aligned(after)
    b = before.select(
        *key_cols, F.struct(*non_key).alias("__b")
    )
    a = after.select(*key_cols, F.struct(*non_key).alias("__a"))
    joined = b.join(a, key_cols, "full_outer")
    # eqNullSafe: a NULL in one version's non-key field is a real change,
    # and NULL == NULL counts as unchanged (plain != would return NULL
    # and silently drop both cases)
    change = (
        F.when(F.col("__b").isNull(), F.lit("insert"))
        .when(F.col("__a").isNull(), F.lit("delete"))
        .when(~F.col("__a").eqNullSafe(F.col("__b")), F.lit("update"))
    )
    changed = joined.withColumn("change_type", change).filter(
        F.col("change_type").isNotNull()
    )
    if include_values:
        return changed.select(
            *key_cols,
            "change_type",
            F.col("__b").alias("before"),
            F.col("__a").alias("after"),
        )
    return changed.select(*key_cols, "change_type")


def merge_snapshot(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    key_col: str,
    *,
    stats_cols: list[str] | None = None,
    resolve: list[str] | None = None,
    txn: tuple[str, int] | None = None,
) -> dict:
    """Copy-on-write MERGE (upsert) into the versioned layer: rows of
    ``delta`` replace head rows sharing their ``key_col`` value; new
    keys insert.  Commits the result as a new version.

    The 100 TB property is FILE-LEVEL PRUNING via the manifest stats:
    only head files whose committed [min, max] range for ``key_col``
    actually CONTAINS a delta key are read, anti-joined, and rewritten —
    every other file is carried into the new manifest verbatim, untouched
    on disk (the same copy-on-write contract as Delta/Iceberg MERGE).  A
    daily CDC upsert against a key-clustered layer therefore rewrites
    O(touched files), not O(table).  Requires ``key_col`` stats in the
    head manifest for pruning (``commit_snapshot(stats_cols=[key])`` on a
    key-clustered write); files without stats are conservatively
    rewritten.  Inserted keys outside every file's range rewrite nothing.

    ``delta`` must carry at least the layer's columns and at most one
    row per key (the MERGE contract).  EXTRA delta columns are ADDITIVE
    SCHEMA EVOLUTION (the CDC-feed reality: an upsert stream gains a
    column): they join the layer schema, the rewritten region carries
    them physically, carried files read NULL for them under
    ``read_snapshot(merge_schema=True)`` — same contract as evolving
    appends, re-type still rejected.  Returns {"version",
    "files_rewritten", "files_carried"}.

    ``resolve=[col, ...]`` turns the blind upsert into LAST-WRITER-WINS
    conflict resolution: among an existing row and a delta row sharing a
    key, the one with the greater ``resolve`` tuple survives — the CDC
    contract for out-of-order updates (an older change replayed late
    must NOT clobber a newer committed state).  The caller guarantees
    ``resolve`` totally orders versions of a key (e.g. event time + a
    unique sequence id).  Default (None) keeps blind delta-wins.

    ``txn=(app_id, version)`` makes the MERGE idempotent per writer,
    exactly like ``commit_snapshot(txn=...)`` — a replayed streaming
    micro-batch merges as a NO-OP (returns the current head with
    ``"noop": True``).  The high-water map is carried forward either way.
    """
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    head = versions[-1]
    m = _manifest_raw(spark, path, head)
    fmt2 = m.get("format", 1) >= 2
    if fmt2:
        total_files = sum(int(e["n_files"]) for e in m.get("segments") or [])
    else:
        total_files = len(m["files"])
    txn_map: dict = m.get("txn", {})
    if txn is not None:
        app, tv = txn
        prev_tv = txn_map.get(app)
        if prev_tv is not None and int(prev_tv) >= int(tv):
            return {
                "version": head,
                "files_rewritten": 0,
                "files_carried": total_files,
                "noop": True,
            }
        txn_map = {**txn_map, app: int(tv)}
    head_schema = m.get("schema")
    delta_types = {f.name: f.dataType.json() for f in delta.schema.fields}
    new_cols: list[str] = []
    if head_schema is not None:
        # ADDITIVE schema evolution (the append path's contract, now on
        # MERGE — CDC feeds evolve, and an upsert stream gaining a
        # column must not need a manual migration): the delta may be a
        # SUPERSET of the head schema; new columns join the layer
        # schema, carried/repacked files simply lack them on disk and
        # read NULL under merge_schema=True (exactly like an evolving
        # append).  DROPPING a layer column is still an error — a merge
        # that silently narrowed rewritten files would corrupt carried
        # rows' reads.
        dropped = sorted(set(head_schema) - set(delta.columns))
        if dropped:
            raise ValueError(
                f"merge delta lacks layer column(s) {dropped} — MERGE "
                "evolves schemas additively only (every committed "
                "column must be present)"
            )
        new_cols = [c for c in delta.columns if c not in head_schema]
        # re-type check: a delta that re-types a column would widen the
        # rewritten files while carried files keep the old type —
        # exactly the mixed-footer layer merge-schema reads explode on,
        # with a manifest still recording the head type
        for name, dtype in head_schema.items():
            if name in delta_types and delta_types[name] != dtype:
                raise ValueError(
                    f"merge delta re-types column {name!r}: committed "
                    f"{dtype}, delta {delta_types[name]} — only "
                    "additive schema evolution is supported"
                )

    # SEGMENT-level candidate selection first (format 2): the delta's
    # key envelope [min, max] — one delta-sized agg job — is tested
    # against each segment entry's aggregate range, so untouched
    # segments are never even LOADED, let alone their files inspected:
    # a narrow CDC batch against a key-clustered 10^7-file layer plans
    # its merge from a handful of segment JSONs.  Untouched candidate
    # segments carry back into the new manifest VERBATIM (by entry
    # reference); only segments that lose a file to the rewrite repack.
    carried_entries: list[dict] = []
    loaded: list[tuple[dict, dict]] = []
    if fmt2:
        env = delta.agg(
            F.min(key_col).alias("__lo"), F.max(key_col).alias("__hi")
        ).first()
        dlo, dhi = env["__lo"], env["__hi"]
        for e in m.get("segments") or []:
            if dlo is not None and _entry_range_keeps(
                e.get("stats") or {}, key_col, dlo, dhi
            ):
                loaded.append((e, _read_segment(spark, e["path"])))
            else:
                carried_entries.append(e)
        files = [f for _, seg in loaded for f in seg["files"]]
        stats = {}
        counts_map: dict = {}
        blooms_map: dict = {}
        sizes_map: dict = {}
        raw_map: dict = {}
        colmeta_map: dict = {}
        for _, seg in loaded:
            stats.update(seg.get("stats") or {})
            counts_map.update(seg.get("counts") or {})
            blooms_map.update(seg.get("blooms") or {})
            sizes_map.update(seg.get("sizes") or {})
            raw_map.update(seg.get("raw_sizes") or {})
            colmeta_map.update(seg.get("colmeta") or {})
    else:
        files, stats = m["files"], m.get("stats", {})
        counts_map = m.get("counts") or {}
        blooms_map = m.get("blooms", {})
        sizes_map = m.get("sizes") or {}
        raw_map = m.get("raw_sizes") or {}
        colmeta_map = m.get("colmeta") or {}

    # exact per-file touch test: join the delta's DISTINCT keys against
    # the (tiny) file-range relation — a file is touched iff some delta
    # key falls inside its committed [min, max].  The collect is bounded
    # by the CANDIDATE file count, never the data.
    ranges = []
    no_stats: list[str] = []
    for f in files:
        s = stats.get(f.rsplit("/", 1)[-1], {}).get(key_col)
        if s is None:
            no_stats.append(f)  # conservatively rewritten
        elif s[0] is None or s[1] is None:
            continue  # zero-row / all-NULL file: no key can match
        else:
            ranges.append((f, s[0], s[1]))
    touched = set(no_stats)
    if ranges:
        rdf = spark.createDataFrame(ranges, ["__f", "__lo", "__hi"])
        hit = (
            delta.select(F.col(key_col).alias("__k"))
            .join(
                F.broadcast(rdf),
                (F.col("__k") >= F.col("__lo"))
                & (F.col("__k") <= F.col("__hi")),
            )
            .select("__f")
            .distinct()
            .collect()
        )
        touched.update(r["__f"] for r in hit)
    # candidate files that survive: repacked into fresh segments with
    # their metadata carried (fmt2), or the legacy carried list
    if fmt2:
        repack_files: list[str] = []
        for e, seg in loaded:
            if not any(f in touched for f in seg["files"]):
                carried_entries.append(e)  # untouched after exact test
            else:
                repack_files.extend(
                    f for f in seg["files"] if f not in touched
                )
    else:
        repack_files = [f for f in files if f not in touched]

    version = head + 1
    data_dir = f"{path}/data/v{version}-{uuid.uuid4().hex[:8]}"
    # layer column order first, evolved columns appended — all new data
    # files agree positionally
    cols = (
        list(head_schema) + new_cols if head_schema else list(delta.columns)
    )
    col_types = {**(head_schema or {}), **delta_types}
    if touched:
        # DV-aware: rows of a touched file already position-deleted must
        # not resurrect through the rewrite.  mergeSchema: touched files
        # may themselves span prior additive evolutions
        touched_sorted = sorted(touched)
        reader = spark.read.option("mergeSchema", "true")
        raw = _apply_delete_entries(
            spark, m, touched_sorted, reader
        ) or reader.parquet(*touched_sorted)
        # NULL-backfill columns the touched files never had on disk
        # (the delta's new columns, or a prior append-evolution column
        # no touched file carries)
        for c in cols:
            if c not in raw.columns:
                raw = raw.withColumn(
                    c, F.lit(None).cast(_type_from_json(col_types[c]))
                )
        if resolve:
            from pyspark.sql import Window

            combined = raw.select(*cols).unionByName(delta.select(*cols))
            w = Window.partitionBy(key_col).orderBy(
                *[F.col(c).desc() for c in resolve]
            )
            out = (
                combined.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            keep = raw.join(delta.select(key_col), key_col, "left_anti")
            out = keep.select(*cols).unionByName(delta.select(*cols))
    else:
        out = delta.select(*cols)  # pure out-of-range insert: zero reads
    out.write.mode("error").parquet(data_dir)
    if m.get("checks"):
        # existing rows pass by induction; this rejects a delta that
        # violates the layer's recorded CHECK constraints
        _enforce_checks(spark, data_dir, m["checks"])
    # CHANGE DATA FEED: when the table property is on, record this
    # commit's exact row-level delta as a change file — the rewritten
    # region's post-image (read back from the just-written files, no
    # recompute) diffed against its DV-applied pre-image, so an
    # unchanged row upserted by the delta (or kept by last-writer-wins)
    # cancels out.  Cost is O(touched region), the same order as the
    # merge itself — which is what makes downstream IVM O(delta) where
    # the generic feed pays two O(table) exceptAll shuffles.
    cdf_entry = None
    if m.get("cdf"):
        post = spark.read.parquet(data_dir).select(*cols)
        if touched:
            # lazy checkpoint: the pre-image feeds BOTH exceptAll
            # branches — without it each branch re-scans the touched
            # region and re-runs the DV joins
            pre = raw.select(*cols).transform(materialize)
            ch = (
                post.exceptAll(pre)
                .withColumn("change_type", F.lit("insert"))
                .unionByName(
                    pre.exceptAll(post).withColumn(
                        "change_type", F.lit("delete")
                    )
                )
            )
        else:
            ch = post.withColumn("change_type", F.lit("insert"))
        ch_dir = f"{path}/_changes/v{version}-{uuid.uuid4().hex[:8]}"
        ch.write.mode("error").parquet(ch_dir)
        cdf_entry = {"path": ch_dir}
    new_files = _list_parquet_files(spark, data_dir)
    merge_dom_inherit = m.get("stat_doms")
    if merge_dom_inherit is None:
        merge_dom_inherit = {c: "string" for c in stats_cols or []}
    # hidden partitioning: the rewritten files re-derive their transform
    # stats (best-effort), so a CDC-maintained spec'd layer keeps
    # pruning sharp instead of degrading to conservative keeps
    merge_derived = _spec_derived_exprs(
        spark.read.parquet(data_dir).schema, m.get("partition_spec")
    )
    new_stats, new_counts, new_colmeta, new_raw, new_doms = _file_stats(
        spark, data_dir, new_files, stats_cols or [], merge_dom_inherit,
        merge_derived,
    )
    merge_stat_doms = {**(m.get("stat_doms") or {}), **new_doms}
    if not stats_cols and not merge_derived:
        new_stats = {}
    repack_bases = {f.rsplit("/", 1)[-1] for f in repack_files}
    # repacked files keep their stats / counts / bloom / column-stat
    # entries verbatim (their bytes never moved); rewritten files get
    # FRESH blooms under the manifest's pinned (m, k) — a CDC-maintained
    # layer merges every cycle, and writing the rewritten region
    # bloom-less would dull point-lookup skipping on exactly the hot
    # tail.  O(rewritten bytes), the same order as the merge itself.
    merge_blooms = (
        _file_blooms(
            spark,
            data_dir,
            new_files,
            m["bloom_col"],
            m=int(m.get("bloom_m") or _BLOOM_BITS),
            k=int(m.get("bloom_k") or _BLOOM_HASHES),
        )
        if m.get("bloom_col") and m["bloom_col"] in cols
        else {}
    )
    repack_entries = _write_segment_entries(
        spark,
        path,
        version,
        repack_files,
        {b: s for b, s in stats.items() if b in repack_bases},
        {b: n for b, n in counts_map.items() if b in repack_bases},
        {b: e for b, e in blooms_map.items() if b in repack_bases},
        {b: n for b, n in sizes_map.items() if b in repack_bases},
        {b: cm for b, cm in colmeta_map.items() if b in repack_bases},
        {b: n for b, n in raw_map.items() if b in repack_bases},
    )
    new_entries = _write_segment_entries(
        spark,
        path,
        version,
        new_files,
        new_stats,
        new_counts,
        merge_blooms,
        _list_parquet_sizes(spark, data_dir),
        new_colmeta,
        new_raw,
    )
    rewritten_bases = {f.rsplit("/", 1)[-1] for f in touched}
    carried_deletes = _trim_delete_entries(
        m.get("delete_files") or [], rewritten_bases
    )
    _write_text(
        spark,
        f"{path}/{_MANIFEST_DIR}/v{version}.json",
        json.dumps(
            {
                "version": version,
                "committed_at": time.time(),
                "mode": "merge",
                "format": 2,
                "segments": carried_entries + repack_entries + new_entries,
                "bloom_col": m.get("bloom_col"),
                "bloom_m": m.get("bloom_m"),
                "bloom_k": m.get("bloom_k"),
                "delete_files": carried_deletes,
                "schema": (
                    {**head_schema, **{c: delta_types[c] for c in new_cols}}
                    if head_schema
                    else delta_types
                ),
                "checks": m.get("checks") or {},
                "stat_doms": merge_stat_doms,
                "cdf": bool(m.get("cdf")),
                "partition_spec": m.get("partition_spec"),
                "partition_specs_all": m.get("partition_specs_all")
                or m.get("partition_spec"),
                "changes": cdf_entry,
                "txn": txn_map,  # carry writer high-water marks
            },
            default=str,
        ),
    )
    return {
        "version": version,
        "files_rewritten": len(touched),
        "files_carried": total_files - len(touched),
    }


def compact_small_files(
    spark: SparkSession,
    path: str,
    *,
    small_file_bytes: int = 32 * 1024 * 1024,
    target_file_bytes: int = 128 * 1024 * 1024,
    stats_cols: list[str] | None = None,
    fold_deletes: bool = False,
) -> dict:
    """BIN-PACKING compaction (Delta ``OPTIMIZE`` semantics): rewrite
    ONLY the head files smaller than ``small_file_bytes``, coalesced
    into ~``target_file_bytes`` outputs; every file already at a healthy
    size is carried into the new manifest verbatim — stats, counts,
    Bloom entries and deletion-vector entries intact, zero bytes moved.

    ``fold_deletes=True`` additionally forces every file a live
    position/equality delete entry TOUCHES into the rewrite regardless
    of its size, so the commit clears the merge-on-read entries a
    "fold_deletes"-only maintenance plan names — without it, a delete
    touching only healthy-sized files would survive the size sweep and
    the layer would keep paying the merge-on-read tax while reporting
    itself compacted.  Packed outputs get fresh Bloom bit sets under
    the manifest's pinned (m, k) when the layer carries a bloom_col
    (same contract as ``rewrite_snapshot``) — the maintenance job must
    never un-tune the index it maintains.

    This is the steady-state maintenance job for a layer fed by
    O(delta) appends or streaming micro-batches: each run costs
    O(small-file bytes), not O(table) — ``rewrite_snapshot`` (full
    rewrite) is only for re-layout (clustering / Z-order).  Small files
    read through the merge-on-read path, so THEIR deletion vectors fold
    into the rewrite; carried files keep theirs live.  Fewer than two
    small files is a NO-OP (nothing to pack) returning the head.
    Returns {"version", "files_rewritten", "files_carried"}.
    """
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    head = versions[-1]
    m = _manifest_raw(spark, path, head)
    fmt2 = m.get("format", 1) >= 2
    jvm, fs = _fs(spark, path)

    def _size(f: str, sizes: dict) -> int:
        # manifest-recorded size when present (no RPC), fs stat otherwise
        b = f.rsplit("/", 1)[-1]
        return (
            int(sizes[b])
            if b in sizes
            else int(fs.getFileStatus(_hpath(jvm, f)).getLen())
        )

    # fold_deletes: bases a live delete entry touches rewrite
    # unconditionally (their deletion vectors fold into the rewrite)
    forced: set[str] = set()
    if fold_deletes:
        for e in m.get("delete_files") or []:
            t = e.get("touches") or {}
            forced.update(t if isinstance(t, (list, tuple)) else t.keys())

    def _packs(f: str, sizes: dict) -> bool:
        return (
            _size(f, sizes) < small_file_bytes
            or f.rsplit("/", 1)[-1] in forced
        )

    carried_entries: list[dict] = []
    small: list[str] = []
    small_bytes = 0
    repack_files: list[str] = []
    stats_map: dict = {}
    counts_map: dict = {}
    blooms_map: dict = {}
    sizes_map: dict = {}
    raw_map: dict = {}
    colmeta_map: dict = {}
    total_files = 0
    if fmt2:
        # per-segment: a segment with NO small file carries into the new
        # manifest verbatim (entry reference, metadata untouched); a
        # mixed segment splits — small files rewrite, healthy files
        # repack with their metadata carried
        for e in m.get("segments") or []:
            total_files += int(e["n_files"])
            seg = _read_segment(spark, e["path"])
            sizes = seg.get("sizes") or {}
            seg_small = [f for f in seg["files"] if _packs(f, sizes)]
            if not seg_small:
                carried_entries.append(e)
                continue
            small.extend(seg_small)
            small_bytes += sum(_size(f, sizes) for f in seg_small)
            small_set = set(seg_small)
            repack_files.extend(
                f for f in seg["files"] if f not in small_set
            )
            stats_map.update(seg.get("stats") or {})
            counts_map.update(seg.get("counts") or {})
            blooms_map.update(seg.get("blooms") or {})
            sizes_map.update(sizes)
            raw_map.update(seg.get("raw_sizes") or {})
            colmeta_map.update(seg.get("colmeta") or {})
    else:
        mm = _manifest(spark, path, head)
        total_files = len(mm["files"])
        sizes_map = mm.get("sizes") or {}
        for f in mm["files"]:
            if _packs(f, sizes_map):
                small.append(f)
                small_bytes += _size(f, sizes_map)
            else:
                repack_files.append(f)
        stats_map = mm.get("stats", {})
        counts_map = mm.get("counts") or {}
        blooms_map = mm.get("blooms", {})
        raw_map = mm.get("raw_sizes") or {}
        colmeta_map = mm.get("colmeta") or {}
    if len(small) < 2 and not (forced and small):
        # < 2 small files is nothing to pack — UNLESS a forced
        # delete-touched file is among them, whose rewrite is the point
        return {
            "version": head,
            "files_rewritten": 0,
            "files_carried": total_files,
        }
    import math

    n_out = max(1, math.ceil(small_bytes / target_file_bytes))
    reader = spark.read.option("mergeSchema", "true")
    raw = _apply_delete_entries(spark, m, small, reader) or reader.parquet(
        *small
    )
    version = head + 1
    data_dir = f"{path}/data/v{version}-{uuid.uuid4().hex[:8]}"
    raw.coalesce(n_out).write.mode("error").parquet(data_dir)
    new_files = _list_parquet_files(spark, data_dir)
    compact_dom_inherit = m.get("stat_doms")
    if compact_dom_inherit is None:
        compact_dom_inherit = {c: "string" for c in stats_cols or []}
    # re-derive hidden-partitioning transform stats for the packed
    # files (best-effort — see _spec_derived_exprs)
    packed_schema = spark.read.parquet(data_dir).schema
    compact_derived = _spec_derived_exprs(
        packed_schema, m.get("partition_spec")
    )
    new_stats, new_counts, new_colmeta, new_raw, new_doms = _file_stats(
        spark, data_dir, new_files, stats_cols or [], compact_dom_inherit,
        compact_derived,
    )
    compact_stat_doms = {**(m.get("stat_doms") or {}), **new_doms}
    if not stats_cols and not compact_derived:
        new_stats = {}
    # the packed outputs hold MOST of the layer's rows after a few
    # maintenance cycles — writing them bloom-less (as pre-r10 code
    # did with a literal ``{}``) strips the point-lookup index off
    # exactly the files compaction produces AND voids their segments'
    # bloom unions; recompute with the manifest's pinned (m, k) so old
    # and new files probe bit-identically (same contract as
    # ``rewrite_snapshot``'s recompute).  O(packed bytes) — the scan
    # cost the rewrite already paid.
    bloom_col = m.get("bloom_col")
    new_blooms = (
        _file_blooms(
            spark,
            data_dir,
            new_files,
            bloom_col,
            m=int(m.get("bloom_m") or _BLOOM_BITS),
            k=int(m.get("bloom_k") or _BLOOM_HASHES),
        )
        if bloom_col and bloom_col in packed_schema.names
        else {}
    )
    repack_bases = {f.rsplit("/", 1)[-1] for f in repack_files}
    repack_entries = _write_segment_entries(
        spark,
        path,
        version,
        repack_files,
        {b: s for b, s in stats_map.items() if b in repack_bases},
        {b: n for b, n in counts_map.items() if b in repack_bases},
        {b: e for b, e in blooms_map.items() if b in repack_bases},
        {b: n for b, n in sizes_map.items() if b in repack_bases},
        {b: cm for b, cm in colmeta_map.items() if b in repack_bases},
        {b: n for b, n in raw_map.items() if b in repack_bases},
    )
    new_entries = _write_segment_entries(
        spark,
        path,
        version,
        new_files,
        new_stats,
        new_counts,
        new_blooms,
        _list_parquet_sizes(spark, data_dir),
        new_colmeta,
        new_raw,
    )
    rewritten_bases = {f.rsplit("/", 1)[-1] for f in small}
    carried_deletes = _trim_delete_entries(
        m.get("delete_files") or [], rewritten_bases
    )
    _write_text(
        spark,
        f"{path}/{_MANIFEST_DIR}/v{version}.json",
        json.dumps(
            {
                "version": version,
                "committed_at": time.time(),
                "mode": "compact",
                "format": 2,
                "segments": carried_entries + repack_entries + new_entries,
                "bloom_col": m.get("bloom_col"),
                "bloom_m": m.get("bloom_m"),
                "bloom_k": m.get("bloom_k"),
                "delete_files": carried_deletes,
                "schema": m.get("schema"),
                "checks": m.get("checks") or {},
                "stat_doms": compact_stat_doms,
                "cdf": bool(m.get("cdf")),
                "partition_spec": m.get("partition_spec"),
                "partition_specs_all": m.get("partition_specs_all")
                or m.get("partition_spec"),
                "txn": m.get("txn", {}),
            },
            default=str,
        ),
    )
    return {
        "version": version,
        "files_rewritten": len(small),
        "files_carried": total_files - len(small),
    }


def rewrite_snapshot(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    stats_cols: list[str] | None = None,
    cluster_by: str | None = None,
    zorder_by: list[str] | None = None,
    n_files: int | None = None,
) -> dict:
    """Small-file compaction INSIDE the versioned layer: read the head
    version, rewrite it byte-sized to ~``target_file_bytes`` files
    (``coalesce`` — compaction must not pay a shuffle), and commit the
    compacted file set as a NEW version.  Same rows, fewer files.

    ``cluster_by=col`` additionally RANGE-CLUSTERS the rewrite on that
    column (``repartitionByRange`` — this variant deliberately pays one
    shuffle) and records its per-file stats, making the manifest's data
    skipping sharp where the head's layout had every file straddling
    every value range; this is also the layout ``merge_snapshot`` needs
    for file-level pruning.  ``n_files`` overrides the byte sizing
    (tests / explicit re-bucketing); production sizing stays byte-based.

    ``zorder_by=[c1, c2, ...]`` (mutually exclusive with ``cluster_by``)
    is the MULTI-dimensional variant — Delta ``OPTIMIZE ZORDER BY``:
    the rewrite range-partitions + sorts on the Morton interleave of the
    normalized key columns (``operators.layout.zorder_value``, a pure
    JVM expression after one broadcast min/max row), so per-file
    [min, max] stays narrow on EVERY participating column and a
    predicate on ANY of them prunes files, where a single-column
    cluster leaves every other dimension scrambled.  Columns must be
    numeric (hash strings upstream); their stats are recorded.

    This composes ``sinks.compact_parquet_layer`` with the manifest
    layer, which is where it matters at 100 TB: O(delta) appends are
    exactly how a snapshot layer accumulates small files, and a
    directory-level compact would break time travel.  Here old versions
    keep reading their original files untouched (the manifest pins
    them); readers of the new head plan over the compacted set; and
    ``vacuum_snapshots`` GCs the small files once retention passes.
    File sizing resolves through the manifest's exact file list via the
    Hadoop FileSystem API, so hdfs:// and s3a:// layers size
    identically to local ones.

    Returns {"version", "files_before", "files_after", "bytes"}.
    """
    import math

    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    head = versions[-1]
    head_m = _manifest(spark, path, head)
    files = snapshot_files(spark, path, head)
    jvm, fs = _fs(spark, path)
    total = sum(fs.getFileStatus(_hpath(jvm, f)).getLen() for f in files)
    if n_files is None:
        n_files = max(1, math.ceil(total / target_file_bytes))
    if cluster_by is not None and zorder_by is not None:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    # merge_schema: a layer evolved by appends or MERGE has files with
    # differing physical schemas — an overwrite rewritten from the
    # newest-footer schema would silently DROP the evolved columns
    df = read_snapshot(spark, path, head, merge_schema=True)
    if cluster_by is not None:
        df = df.repartitionByRange(n_files, cluster_by)
        stats_cols = sorted(set(stats_cols or []) | {cluster_by})
    elif zorder_by is not None:
        from ..operators.layout import zorder_layout

        pow2 = 1 << max(1, (max(2, n_files) - 1).bit_length())
        df = (
            zorder_layout(df, list(zorder_by), n_files=pow2)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z", "__file_id")
        )
        stats_cols = sorted(set(stats_cols or []) | set(zorder_by))
    else:
        df = df.coalesce(n_files)
    # a re-LAYOUT must not change the table's invariants or indexes: the
    # head's CHECK constraints and bloom column pass through the
    # overwrite commit (which never inherits them on its own — only
    # appends do), exactly as compact_small_files carries them; the
    # bloom index is recomputed over the rewritten files
    new_v = commit_snapshot(
        spark,
        df,
        path,
        mode="overwrite",
        stats_cols=stats_cols,
        bloom_col=head_m.get("bloom_col"),
        checks=head_m.get("checks") or None,
        # a re-layout keeps the layer's hidden-partitioning property and
        # RECOMPUTES the transform stats over the rewritten files (the
        # one mutator that re-derives them; merge/compact leave their new
        # files conservatively unpruned until the next rewrite)
        partition_spec=head_m.get("partition_spec"),
    )
    return {
        "version": new_v,
        "files_before": len(files),
        "files_after": len(snapshot_files(spark, path, new_v)),
        "bytes": total,
    }


def vacuum_snapshots(
    spark: SparkSession,
    path: str,
    *,
    keep_last: int = 2,
    orphan_grace_seconds: float = 24 * 3600,
    retain_seconds: float | None = None,
    dry_run: bool = False,
) -> dict:
    """Retention + orphan GC (the maintenance job every versioned layer
    needs): drop all but the newest ``keep_last`` manifests, then delete
    every staging DIRECTORY none of the surviving manifests reference —
    including dirs staged by crashed commits that never reached their
    manifest write (whole-dir recursive delete, so ``_SUCCESS`` markers
    and CRC sidecars go too, never just the ``*.parquet`` files).

    ``retain_seconds`` adds AGE-BASED retention (Delta's ``VACUUM ...
    RETAIN N HOURS``): a version younger than the cutoff is kept even
    when it falls outside ``keep_last`` — retention by age composes
    with retention by count as a UNION (age can only keep MORE, so
    catalog pin floors sized in versions stay safe).  A version whose
    manifest cannot be read re-checks as KEPT (never guess about
    history).  Count-only remains the default.

    Writer safety — two rules keep vacuum from racing an IN-FLIGHT
    commit (staged data, manifest not yet renamed in), which would
    otherwise commit a version referencing deleted files:

    - staging dirs whose version is GREATER than the newest committed
      version are exactly in-flight or crashed future commits; they are
      skipped unless older than ``orphan_grace_seconds`` (default 24 h —
      Delta/Iceberg vacuum use the same retention idea).  Pass ``0``
      only in tests or when no writer can be live.
    - a dir at or below the head whose commit LOST the optimistic race
      is doomed anyway (its manifest rename can never succeed), so
      deleting it at worst fails a job that was already failing.

    ``dry_run=True`` reports exactly what a real run would drop and
    delete — versions, file counts, in-flight skips — while touching
    NOTHING (Delta's VACUUM DRY RUN): the audit step before pointing a
    retention job at a production layer.

    Returns {"dropped_versions": [...], "deleted_files": n,
    "deleted_segments": n, "skipped_in_flight": [...], "dry_run": bool}.  Safe order for
    readers: manifests are
    deleted FIRST, so a reader racing the vacuum either resolves a
    surviving version (whose files all remain) or fails on the manifest
    read — it can never plan a scan over a file the GC pass is about to
    remove.
    """
    versions = snapshot_versions(spark, path)
    head = versions[-1] if versions else 0
    keep_set = set(versions[-keep_last:]) if keep_last > 0 else set()
    if retain_seconds is not None:
        cutoff = time.time() - float(retain_seconds)
        for v in versions:
            if v in keep_set:
                continue
            try:
                committed = float(
                    _manifest_raw(spark, path, v).get("committed_at") or 0.0
                )
            except Exception:
                committed = float("inf")  # unreadable: keep, never guess
            if committed >= cutoff:
                keep_set.add(v)
    # back-reference pins (shallow clones / published WAP branches that
    # reference this layer's files in place): a pinned version joins the
    # keep set regardless of count/age retention — GC-ing it would
    # silently corrupt the dependent table.  Union semantics, like age.
    pinned_kept: list[int] = []
    for pin in snapshot_pins(spark, path):
        pv = int(pin["version"])
        if pv in versions and pv not in keep_set:
            keep_set.add(pv)
            pinned_kept.append(pv)
    keep = sorted(keep_set)
    dropped = [v for v in versions if v not in keep_set]
    jvm, fs = _fs(spark, path)
    if not dry_run:
        for v in dropped:
            fs.delete(_hpath(jvm, f"{path}/{_MANIFEST_DIR}/v{v}.json"), False)
    # stale manifest staging temps (crashed _write_text) age out too
    mdir = _hpath(jvm, f"{path}/{_MANIFEST_DIR}")
    now_ms = time.time() * 1000.0
    grace_ms = orphan_grace_seconds * 1000.0
    if fs.exists(mdir):
        for status in fs.listStatus(mdir):
            name = status.getPath().getName()
            if ".tmp-" in name and now_ms - status.getModificationTime() > grace_ms:
                if not dry_run:
                    fs.delete(status.getPath(), False)
    live: set[str] = set()
    live_dv: set[str] = set()
    live_seg: set[str] = set()
    live_ch: set[str] = set()
    for v in keep:
        mf = _manifest(spark, path, v)
        live.update(mf["files"])
        # manifest paths are as-written (possibly scheme-less); the
        # directory listing below yields fully-qualified URIs — qualify
        # both sides so the live check compares like with like
        live_dv.update(
            fs.makeQualified(_hpath(jvm, e["path"])).toString()
            for e in mf.get("delete_files") or []
        )
        live_seg.update(
            fs.makeQualified(_hpath(jvm, e["path"])).toString()
            for e in mf.get("segments") or []
        )
        if mf.get("changes"):
            live_ch.add(
                fs.makeQualified(
                    _hpath(jvm, mf["changes"]["path"])
                ).toString()
            )
    deleted = 0
    deleted_segments = 0
    skipped: list[str] = []
    # segment files (manifest metadata, counted separately from data
    # files): same lifecycle as data staging dirs — keep those a
    # surviving manifest references (including a CLONE's references into
    # its own dir; a clone's vacuum lists only its own segments dir, so
    # it can never GC the source's), grace-skip possible in-flight
    # future commits, GC the rest.  _write_text staging temps age out.
    segdir = _hpath(jvm, f"{path}/{_MANIFEST_DIR}/segments")
    seg_re = re.compile(r"^v(\d+)-[0-9a-f]+\.json$")
    if fs.exists(segdir):
        for status in fs.listStatus(segdir):
            name = status.getPath().getName()
            spath = status.getPath().toString()
            if spath in live_seg:
                continue
            if ".tmp-" in name:
                if now_ms - status.getModificationTime() > grace_ms and not dry_run:
                    fs.delete(status.getPath(), False)
                continue
            sm = seg_re.match(name)
            seg_v = int(sm.group(1)) if sm else 0
            if (
                seg_v > head
                and now_ms - status.getModificationTime() <= grace_ms
            ):
                skipped.append(spath)
                continue
            deleted_segments += 1
            if not dry_run:
                fs.delete(status.getPath(), False)
    # change-feed dirs: same lifecycle as position-delete dirs — keep
    # those a surviving manifest's "changes" entry references,
    # grace-skip possible in-flight future versions, GC the rest
    chdir = _hpath(jvm, f"{path}/_changes")
    if fs.exists(chdir):
        for status in fs.listStatus(chdir):
            cpath = status.getPath().toString()
            if cpath in live_ch:
                continue
            # lazily-materialized pre-image caches stage under a
            # dot-prefixed .tmp- name FOR A VERSION AT OR BELOW HEAD
            # (the delete committed long before the first CDF read),
            # so the stage_v > head grace below can never protect them
            # — give in-flight temps the same age-based grace as
            # manifest/segment staging, or a concurrent vacuum deletes
            # the dir mid-write and fails the first CDF read
            if status.getPath().getName().startswith(".tmp-"):
                if now_ms - status.getModificationTime() > grace_ms:
                    if not dry_run:
                        fs.delete(status.getPath(), True)
                else:
                    skipped.append(cpath)
                continue
            mm = _STAGE_RE.match(status.getPath().getName())
            stage_v = int(mm.group(1)) if mm else 0
            if (
                stage_v > head
                and now_ms - status.getModificationTime() <= grace_ms
            ):
                skipped.append(cpath)
                continue
            deleted += len(_list_parquet_files(spark, cpath))
            if not dry_run:
                fs.delete(status.getPath(), True)
    # position-delete dirs: same lifecycle as data staging dirs — keep
    # those a surviving manifest references, grace-skip possible
    # in-flight future versions, GC the rest recursively
    dvdir = _hpath(jvm, f"{path}/deletes")
    if fs.exists(dvdir):
        for status in fs.listStatus(dvdir):
            dpath = status.getPath().toString()
            if dpath in live_dv:
                continue
            mm = _STAGE_RE.match(status.getPath().getName())
            stage_v = int(mm.group(1)) if mm else 0
            if (
                stage_v > head
                and now_ms - status.getModificationTime() <= grace_ms
            ):
                skipped.append(dpath)
                continue
            deleted += len(_list_parquet_files(spark, dpath))
            if not dry_run:
                fs.delete(status.getPath(), True)
    ddir = _hpath(jvm, f"{path}/data")
    if not fs.exists(ddir):
        return {
            "dropped_versions": dropped,
            "deleted_files": deleted,
            "deleted_segments": deleted_segments,
            "skipped_in_flight": skipped,
            "pinned_versions_kept": pinned_kept,
            "dry_run": dry_run,
        }
    for status in fs.listStatus(ddir):
        dpath = status.getPath().toString()
        dfiles = _list_parquet_files(spark, dpath)
        if any(f in live for f in dfiles):
            # a surviving manifest references this commit's files; our
            # commits reference staging dirs all-or-nothing, but stay
            # defensive and GC file-by-file if that invariant ever bends
            for f in dfiles:
                if f not in live:
                    if not dry_run:
                        fs.delete(_hpath(jvm, f), False)
                    deleted += 1
            continue
        m = _STAGE_RE.match(status.getPath().getName())
        stage_v = int(m.group(1)) if m else 0
        if stage_v > head and now_ms - status.getModificationTime() <= grace_ms:
            skipped.append(dpath)  # possibly an in-flight commit
            continue
        deleted += len(dfiles)
        if not dry_run:
            fs.delete(status.getPath(), True)
    return {
        "dropped_versions": dropped,
        "deleted_files": deleted,
        "deleted_segments": deleted_segments,
        "skipped_in_flight": skipped,
        "pinned_versions_kept": pinned_kept,
        "dry_run": dry_run,
    }


def snapshot_maintenance_plan(
    spark: SparkSession,
    path: str,
    *,
    target_rows_per_file: int,
    small_file_rows: int | None = None,
    overlap_threshold: float = 0.5,
    version: int | None = None,
) -> DataFrame:
    """TABLE-MAINTENANCE ADVISOR, metadata-only: one pass over the
    layer's manifest JSON (never a data file) emits the maintenance
    actions a steady-state table needs, each with the figures an
    operator would schedule by — the Delta/Iceberg "describe detail +
    human judgment" loop as a queryable plan.

    Emitted actions (one row each, only when warranted):

    - ``compact_small_files`` — >= 2 live files under
      ``small_file_rows`` (default ``target_rows_per_file // 2``) whose
      repack would actually shrink the file count;
      ``predicted_files`` = ceil(small rows / target).
    - ``cluster`` — emitted when EXACTLY ONE stats column's live
      per-file [min, max] ranges OVERLAP beyond ``overlap_threshold``
      (files sorted by range start; a file overlaps when it starts
      before the running max end).  Overlapping ranges are what make
      data skipping dull — the signal a
      ``rewrite_snapshot(cluster_by=...)`` pays for itself.
      ``overlap_files`` carries the count.
    - ``zorder`` — when TWO OR MORE stats columns are overlap-dull, ONE
      row recommending a multi-column
      ``rewrite_snapshot(zorder_by=[...])`` instead of per-column
      cluster rows (a single-column cluster sharpens one dimension and
      scrambles the rest; the Morton interleave narrows all).  ``col``
      is the comma-joined sorted dull columns, ``overlap_files`` the
      summed per-column overlap counts.
    - ``fold_deletes`` — live deletion-vector / equality-delete entries
      force merge-on-read on their touched files and suppress
      metadata-only row counts; a compaction/rewrite folds them.
    - ``vacuum`` — data files referenced ONLY by non-head versions
      (reclaimable once retention retires those versions);
      ``predicted_files`` = 0 (they disappear).

    Thresholds are ROW-based, not byte-based, so the plan (and its
    test oracles) is deterministic across writers/codecs; a byte-based
    wrapper can divide by the layer's observed bytes-per-row.  Rows
    sort by action name.  Uses the materialized manifest view
    (``_manifest``) — the documented maintenance-job path, O(files)
    metadata."""
    return spark.createDataFrame(
        _maintenance_plan_rows(
            spark,
            path,
            target_rows_per_file=target_rows_per_file,
            small_file_rows=small_file_rows,
            overlap_threshold=overlap_threshold,
            version=version,
        ),
        "action string, col string, n_files long, n_rows long, "
        "predicted_files long, overlap_files long",
    )


def _maintenance_plan_rows(
    spark: SparkSession,
    path: str,
    *,
    target_rows_per_file: int,
    small_file_rows: int | None = None,
    overlap_threshold: float = 0.5,
    version: int | None = None,
) -> list[tuple]:
    """``snapshot_maintenance_plan``'s rows as plain Python tuples —
    the whole advisor is manifest-JSON arithmetic, so callers sweeping
    MANY layers (``catalog_maintenance_plan``, the stream governors)
    batch these into ONE local relation instead of paying a
    DataFrame-construction + union + sort Spark job per layer (the
    measured 4s-warm-sweep cause the r11 verdict flagged)."""
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    v = versions[-1] if version is None else version
    m = _manifest(spark, path, v)
    counts: dict = m.get("counts") or {}
    stats: dict = m.get("stats") or {}
    live_bases = [f.rsplit("/", 1)[-1] for f in m.get("files") or []]
    small_cut = (
        int(small_file_rows)
        if small_file_rows is not None
        else int(target_rows_per_file) // 2
    )
    rows: list[tuple] = []

    # compact_small_files: known-count live files under the threshold
    small = [
        b for b in live_bases if b in counts and int(counts[b]) < small_cut
    ]
    small_rows = sum(int(counts[b]) for b in small)
    predicted = max(1, -(-small_rows // int(target_rows_per_file)))
    if len(small) >= 2 and predicted < len(small):
        rows.append(
            ("compact_small_files", None, len(small), small_rows, predicted, None)
        )

    # cluster: per stats column, how many live files START before the
    # running max end of the files already seen (sorted by [lo, hi]).
    # Hidden-partition DERIVED stats (_pt_*) are excluded: a bucket
    # transform's per-file hash range legitimately spans the domain —
    # that is its design, not a layout defect to "fix" with a rewrite
    cols = sorted(
        {
            c
            for b in live_bases
            for c in (stats.get(b) or {})
            if not c.startswith("_pt_")
        }
    )
    dull: list[tuple[str, int, int]] = []  # (col, n_ranges, overlap)
    for col in cols:
        ranges = [
            tuple(stats[b][col])
            for b in live_bases
            if col in (stats.get(b) or {})
            and stats[b][col][0] is not None
            and stats[b][col][1] is not None
        ]
        if len(ranges) < 2:
            continue
        ranges.sort(key=lambda r: (r[0], r[1]))
        overlap = 0
        run_hi = ranges[0][1]
        for lo, hi in ranges[1:]:
            if lo <= run_hi:
                overlap += 1
            run_hi = max(run_hi, hi)
        if overlap / len(ranges) > overlap_threshold:
            dull.append((str(col), len(ranges), overlap))
    total_rows = sum(int(counts.get(b, 0)) for b in live_bases)
    if len(dull) == 1:
        col, n_ranges, overlap = dull[0]
        rows.append(("cluster", col, n_ranges, total_rows, n_ranges, overlap))
    elif len(dull) >= 2:
        # TWO OR MORE overlap-dull dimensions: a single-column cluster
        # would sharpen one and leave the others scrambled — recommend
        # ONE multi-column Z-ORDER rewrite instead (the machinery
        # exists: rewrite_snapshot(zorder_by=[...]) range-partitions on
        # the Morton interleave so EVERY participating column's
        # per-file [min, max] narrows).  col carries the comma-joined
        # sorted dimensions; overlap_files sums the per-column overlap
        # counts (the signal strength the rewrite must clear)
        rows.append(
            (
                "zorder",
                ",".join(c for c, _, _ in dull),
                max(n for _, n, _ in dull),
                total_rows,
                max(n for _, n, _ in dull),
                sum(o for _, _, o in dull),
            )
        )

    # fold_deletes: live delete entries at the head force merge-on-read
    dels = m.get("delete_files") or []
    if dels:
        touched: set = set()
        for e in dels:
            t = e.get("touches") or {}
            touched.update(t if isinstance(t, (list, tuple)) else t.keys())
        touched &= set(live_bases)
        if touched:
            rows.append(
                (
                    "fold_deletes",
                    None,
                    len(touched),
                    sum(int(counts.get(b, 0)) for b in sorted(touched)),
                    len(touched),
                    None,
                )
            )

    # vacuum: files only other versions reference (union of every
    # non-planned version's file set minus this one's) — O(versions)
    # manifest reads, still metadata.  Only meaningful when planning
    # the HEAD: for a time-traveled version, "files not in v" includes
    # NEWER versions' files, which are live, not reclaimable
    if len(versions) > 1 and v == versions[-1]:
        old_counts: dict = {}
        head_set = set(live_bases)
        for ov in versions:
            if ov == v:
                continue
            om = _manifest(spark, path, ov)
            for f in om.get("files") or []:
                b = f.rsplit("/", 1)[-1]
                if b not in head_set:
                    old_counts[b] = int((om.get("counts") or {}).get(b, 0))
        if old_counts:
            rows.append(
                (
                    "vacuum",
                    None,
                    len(old_counts),
                    sum(old_counts.values()),
                    0,
                    None,
                )
            )

    rows.sort(key=lambda r: (r[0], r[1] or ""))
    return rows
