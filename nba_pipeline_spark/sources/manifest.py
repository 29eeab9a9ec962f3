"""Minimal snapshot/manifest table format over the parquet lake —
atomic multi-file commits, lock-free snapshot-isolated readers, and
time travel, the slice of Iceberg/Delta semantics the batch-dir lake
needs (SCALE.md "Batch-dir compaction": plain dir swaps give readers
a maintenance window; a manifest removes it). The reference's own
warehouse intent is a transactional store (BigQuery, IaC/main.tf:45-55);
this is the lake-native equivalent.

Layout::

    lake/
      data/<segment>/          immutable parquet dirs (_SUCCESS-committed)
      _manifests/v<NNNNNNNN>.json   one JSON file per table version

A manifest lists the data segments that make up one table version.
Segments are IMMUTABLE once referenced: every operation (append,
replace, compact) writes NEW segment dirs and then publishes a new
manifest; nothing a committed manifest points at is ever rewritten.

**Commit = one atomic file rename.** The manifest is written to a tmp
name and renamed to ``v<version>.json``. Rename-if-absent doubles as
optimistic concurrency control: if two writers race to version N, one
rename fails (destination exists), and the loser re-reads the latest
version, re-points its parent list, and retries with N+1 — its already
written data segment is reused, only the pointer retries. (Atomic on
HDFS/ABFS, where FileContext.rename without OVERWRITE is a single
atomic fail-on-existing namespace op; on S3 swap the rename for a
conditional PUT ``If-None-Match:*`` — same one-object commit point.
On a LOCAL filesystem the fail-on-existing check is exists+rename(2),
not atomic — test-grade only, one writer per host.)

**Snapshot isolation for free.** A reader resolves ONE manifest file
and plans over the segments it lists. Compaction publishes a new
manifest pointing at the consolidated segment but deletes nothing, so
an in-flight reader of the old version keeps scanning the old segments
untouched — no maintenance window. Old segments die only in `vacuum`,
which retains the last ``keep_versions`` manifests and removes
segments no retained manifest references (plus dead partial writes).

**Crash anywhere is safe**: a crash before the rename leaves an orphan
segment and/or tmp manifest that no committed manifest references —
invisible to every reader, reclaimed by vacuum. A crash after the
rename is a completed commit.

At 100 TB: the manifest holds directory names, not per-file entries, so
it stays KB-sized; resolution is one small-file read on the driver;
scan planning over the listed dirs is Spark's normal file-index path
(partition pruning and predicate pushdown still apply per segment).

**Segment metadata → manifest-level data skipping.** A commit may tag
its segment with a partition value (``partition={col: val}``) and/or
min/max column stats (``stats_cols=[...]``, one extra agg job at write
time). The metadata lives in the manifest (``meta``), so the DRIVER
prunes segments before Spark ever lists their files: a point lookup on
a partition-tagged lake opens one segment's directory, not a thousand
(`read_snapshot(part_eq=...)` / `ranges=...`). Segments without
metadata are never pruned (no information → must scan) — skipping is
always sound. ``commit_upsert_partitioned`` builds on the same tags to
MERGE facts by rewriting only the touched partitions' segments.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"
# Idempotency-tag retention: each manifest keeps the most recent
# _MAX_TAGS tags (insertion order). Replay guards only need to cover
# the possible redelivery horizon — a handful of batches — so 10k is
# orders of magnitude past any real window while keeping the manifest
# KB-sized at unbounded commit counts.
_MAX_TAGS = 10_000


def _jpath(spark: SparkSession, p: str):
    return spark._jvm.org.apache.hadoop.fs.Path(p)


def _fs(spark: SparkSession, p: str):
    jp = _jpath(spark, p)
    return jp.getFileSystem(spark._jsc.hadoopConfiguration()), jp


def _manifest_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed versions, ascending. A ``.tmp`` file is an
    uncommitted write in flight — never listed."""
    mdir = f"{path}/{_MANIFEST_DIR}"
    fs, jp = _fs(spark, mdir)
    if not fs.exists(jp):
        return []
    out = []
    for st in fs.listStatus(jp):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(spark: SparkSession, path: str, version: int) -> dict:
    mfile = f"{path}/{_MANIFEST_DIR}/v{version:08d}.json"
    fs, jp = _fs(spark, mfile)
    stream = fs.open(jp)
    try:
        # py4j byte[] args are pass-by-value (a Python-side buffer
        # never sees Java-side writes), so drain via commons-io
        content = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(content)


def _rename_no_overwrite(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomic rename that FAILS if `dst` exists — the commit primitive.
    ``FileSystem.rename`` can't be trusted for this (RawLocalFileSystem
    delegates to POSIX rename(2), which silently replaces the
    destination); ``FileContext.rename`` without the OVERWRITE option
    enforces fail-on-existing on every implementation (atomic on
    HDFS/ABFS — the same primitive Delta's HDFSLogStore commits with)."""
    jvm = spark._jvm
    jdst = _jpath(spark, dst)
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        jdst.toUri(), spark._jsc.hadoopConfiguration()
    )
    opts = spark.sparkContext._gateway.new_array(
        jvm.org.apache.hadoop.fs.Options.Rename, 0
    )
    try:
        fc.rename(_jpath(spark, src), jdst, opts)
        return True
    except Exception as e:  # Py4JJavaError: lost the CAS race
        msg = str(e)
        if "AlreadyExists" in msg or "already exists" in msg:
            return False
        raise


def _write_segment(df: DataFrame, path: str, target_files: int | None) -> str:
    seg = f"seg-{uuid.uuid4().hex[:12]}"
    writer = df.coalesce(target_files) if target_files else df
    writer.write.mode("overwrite").parquet(f"{path}/{_DATA_DIR}/{seg}")
    return seg


class CommitConflict(RuntimeError):
    """Raised when `expected_parent` no longer matches the latest
    version — the caller's data segment was derived from a superseded
    snapshot and must be recomputed (see commit_upsert)."""


def _commit(
    spark: SparkSession,
    path: str,
    op: str,
    segments_fn,
    max_tries: int = 20,
    tag: str | None = None,
    expected_parent: int | None = None,
    meta_fn=None,
) -> int:
    """Publish a new manifest via rename-if-absent CAS.

    ``segments_fn(parent_manifest | None) -> list[str]`` computes the
    new live segment list from the parent snapshot; it re-runs on CAS
    retry so the parent is always the version actually superseded.

    `tag` is an idempotency token: it joins the manifest's CUMULATIVE
    ``tags`` list (parent tags + this one), so `committed_tags` answers
    "was this commit already applied?" from the latest manifest alone —
    the streaming sink's replay guard survives vacuum (which keeps the
    newest manifests, whose tag set is complete by construction).

    `expected_parent` turns the commit into a strict compare-and-swap
    on a SPECIFIC snapshot: if the latest version moved past it, raise
    CommitConflict instead of committing data derived from a stale
    read (required for read-modify-write ops like upsert, where the
    new segment's CONTENT depends on the parent).

    `meta_fn(parent_manifest | None, segments) -> dict` supplies the
    per-segment metadata map ({seg: {"part": ..., "stats": ...}}); by
    default parent metadata is carried forward for surviving segments
    (new segments start meta-less = never pruned)."""
    mdir = f"{path}/{_MANIFEST_DIR}"
    fs, jmdir = _fs(spark, mdir)
    fs.mkdirs(jmdir)
    for _ in range(max_tries):
        versions = _manifest_versions(spark, path)
        parent = versions[-1] if versions else 0
        if expected_parent is not None and parent != expected_parent:
            raise CommitConflict(
                f"expected parent v{expected_parent}, latest is v{parent}: {path}"
            )
        parent_m = _read_manifest(spark, path, parent) if versions else None
        version = parent + 1
        tags = list(parent_m.get("tags", [])) if parent_m else []
        if tag is not None:
            # atomic idempotency: the check runs INSIDE the CAS loop on
            # the freshly-read parent, so two racing replays of the same
            # tagged commit can't both land — the loser sees the
            # winner's tag here on retry and returns its version (the
            # loser's pre-written segment becomes a vacuumable orphan)
            if tag in tags:
                return parent
            tags.append(tag)
            if len(tags) > _MAX_TAGS:
                tags = tags[-_MAX_TAGS:]
        segments = segments_fn(parent_m)
        parent_meta = dict(parent_m.get("meta", {})) if parent_m else {}
        if meta_fn is not None:
            meta = meta_fn(parent_m, segments)
        else:
            meta = {s: parent_meta[s] for s in segments if s in parent_meta}
        manifest = {
            "version": version,
            "parent": parent if versions else None,
            "op": op,
            "segments": segments,
            "tags": tags,
            "meta": meta,
        }
        tmp = f"{mdir}/.tmp-{uuid.uuid4().hex}.json"
        out = fs.create(_jpath(spark, tmp), True)
        try:
            out.write(bytearray(json.dumps(manifest).encode("utf-8")))
        finally:
            out.close()
        # the commit point: atomic, fails if the version was taken
        if _rename_no_overwrite(spark, tmp, f"{mdir}/v{version:08d}.json"):
            return version
        fs.delete(_jpath(spark, tmp), False)  # lost the race: retry on new parent
    raise RuntimeError(f"manifest commit lost the CAS race {max_tries} times: {path}")


def committed_tags(spark: SparkSession, path: str) -> set[str]:
    """Idempotency tags of every commit folded into the current
    snapshot (cumulative in each manifest — one small-file read)."""
    versions = _manifest_versions(spark, path)
    if not versions:
        return set()
    return set(_read_manifest(spark, path, versions[-1]).get("tags", []))


def _json_safe(v):
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return str(v)  # dates/timestamps: ISO str (lexicographic-comparable)


def _comparable(a, b) -> bool:
    """True when a Python comparison between `a` and `b` provably
    mirrors the engine's: same type, or both non-bool numerics (Python
    int/float cross-compare by VALUE, matching Spark's implicit numeric
    widening). A str-vs-int probe against an int-tagged segment is NOT
    provable either way (Spark would cast; Python would call 2017 !=
    '2017' "different") — the caller must KEEP the segment, because
    skipping must stay sound under type drift between the write-time
    tag and the read-time probe."""
    num = (int, float)
    a_num = isinstance(a, num) and not isinstance(a, bool)
    b_num = isinstance(b, num) and not isinstance(b, bool)
    if a_num and b_num:
        return True
    return type(a) is type(b)


def _provably_lt(a, b) -> bool:
    """a < b when both sides are present and comparably typed; False
    (= "can't prove, keep the segment") otherwise — never raises on a
    str-vs-int stats/probe mismatch."""
    if a is None or b is None or not _comparable(a, b):
        return False
    try:
        return a < b
    except TypeError:
        return False


# Per-segment bloom filters, ADAPTIVELY sized: ~16 bits per distinct
# key (≈0.5% FP at 7 hashes), bitmap between 2^14 bits (2 KB) and
# 2^19 bits (~87 KB base64 in the manifest). Above ~32k distinct keys
# the manifest-level bloom is omitted (never-pruned, always sound) —
# that regime belongs to FILE-level blooms, which parquet itself
# provides (`parquet.bloom.filter.enabled#col` write option; Spark's
# reader consumes them on point predicates inside the segments this
# manifest keeps). Point lookups on high-cardinality keys prune
# segments min/max stats can't: uniformly distributed keys span every
# segment's range but live in exactly one.
_BLOOM_MIN_BITS = 1 << 14
_BLOOM_MAX_BITS = 1 << 19
_BLOOM_BITS_PER_KEY = 16
_BLOOM_HASHES = 7


def _bloom_hash_cols(col):
    from pyspark.sql import functions as F

    # canonicalize through STRING before hashing: the probe side builds
    # a literal whose numeric TYPE (int vs long) the driver can't know,
    # and xxhash64 hashes int 2017 and long 2017 differently — a silent
    # false NEGATIVE. String form is type-stable for integer/string
    # keys (the bloom's use case; don't bloom float keys).
    s = col.cast("string")
    return [F.xxhash64(s, F.lit(seed)) for seed in range(_BLOOM_HASHES)]


def _segment_bloom(df: DataFrame, col: str) -> dict | None:
    """{"bits": m, "b64": bitmap} sized to the segment's distinct key
    count (two agg jobs at commit time), or None when the segment is
    too large for a useful manifest-level bloom."""
    import base64

    from pyspark.sql import functions as F

    n = df.select(col).distinct().count()
    want = max(_BLOOM_MIN_BITS, n * _BLOOM_BITS_PER_KEY)
    if want > _BLOOM_MAX_BITS:
        return None  # saturated bloom prunes nothing: omit, stay sound
    m = _BLOOM_MIN_BITS
    while m < want:
        m <<= 1
    rows = (
        df.select(
            F.explode(
                F.array(
                    *[F.pmod(h, F.lit(m)) for h in _bloom_hash_cols(F.col(col))]
                )
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    bitmap = 0
    for r in rows:
        bitmap |= 1 << int(r["p"])
    return {
        "bits": m,
        "b64": base64.b64encode(bitmap.to_bytes(m // 8, "little")).decode(),
    }


def _bloom_probe_hashes(spark: SparkSession, value) -> list[int]:
    """The k FULL 64-bit hashes for a probe value — computed with the
    SAME engine hash (xxhash64) that built the segment blooms, via a
    1-row job (milliseconds; a Python reimplementation would have to
    track Spark's exact seed/serialization semantics). Positions are
    taken per segment as hash mod that segment's bitmap size."""
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(*[
            c.alias(f"h{i}")
            for i, c in enumerate(_bloom_hash_cols(F.lit(value)))
        ])
        .collect()[0]
    )
    return [int(row[f"h{i}"]) for i in range(_BLOOM_HASHES)]


def _bloom_maybe_contains(entry: dict, hashes: list[int]) -> bool:
    import base64

    m = int(entry["bits"])
    bitmap = int.from_bytes(base64.b64decode(entry["b64"]), "little")
    # Python % on a negative int is floor-mod == Spark's pmod
    return all((bitmap >> (h % m)) & 1 for h in hashes)


def _segment_stats(df: DataFrame, stats_cols: list[str]) -> dict:
    """Per-column [min, max] for the written frame — ONE agg job
    (numeric / string / date columns; the write-time cost of read-time
    data skipping)."""
    from pyspark.sql import functions as F

    row = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in stats_cols],
        *[F.max(c).alias(f"__mx_{c}") for c in stats_cols],
    ).collect()[0]
    return {
        c: [_json_safe(row[f"__mn_{c}"]), _json_safe(row[f"__mx_{c}"])]
        for c in stats_cols
    }


def commit_append(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    target_files: int | None = None,
    tag: str | None = None,
    partition: dict | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Append `df` as a new segment; returns the committed version.
    Pass `tag` for an idempotency token (see `_commit`/`committed_tags`),
    `partition` ({col: value}) / `stats_cols` / `bloom_cols` to record
    manifest metadata for segment-level pruning: partition equality,
    min/max ranges, and bloom point lookups respectively
    (`read_snapshot(part_eq= / ranges= / bloom_eq=)`)."""
    seg = _write_segment(df, path, target_files)
    seg_meta: dict = {}
    if partition is not None:
        seg_meta["part"] = {k: _json_safe(v) for k, v in partition.items()}
    if stats_cols:
        seg_meta["stats"] = _segment_stats(df, stats_cols)
    if bloom_cols:
        blooms = {c: _segment_bloom(df, c) for c in bloom_cols}
        blooms = {c: b for c, b in blooms.items() if b is not None}
        if blooms:
            seg_meta["bloom"] = blooms

    def meta_fn(parent, segments):
        pm = dict(parent.get("meta", {})) if parent else {}
        out = {s: pm[s] for s in segments if s in pm}
        if seg_meta:
            out[seg] = seg_meta
        return out

    return _commit(
        spark, path, "append",
        lambda parent: (parent["segments"] if parent else []) + [seg],
        tag=tag,
        meta_fn=meta_fn,
    )


def commit_replace(
    spark: SparkSession, path: str, df: DataFrame, target_files: int | None = None
) -> int:
    """Replace the table contents wholesale (snapshot overwrite)."""
    seg = _write_segment(df, path, target_files)
    return _commit(spark, path, "replace", lambda parent: [seg])


def compact(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    max_tries: int = 5,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Consolidate the CURRENT snapshot into one segment and commit.
    Concurrent readers are unaffected: their resolved manifests keep
    pointing at the old segments, which remain on disk until vacuum.

    Concurrency: a concurrent APPEND survives — the committed segment
    list is recomputed from the actual parent, keeping the interleaved
    segment. Any NON-append commit landing after the compaction's base
    (replace/upsert — ops that REMOVE rows) invalidates the
    consolidated segment; the lineage walk below detects it and the
    whole consolidation re-runs against the new snapshot, so compact
    can never resurrect replaced rows.

    Partition-tagged lakes keep their tags: when EVERY base segment
    carries a ``part`` tag, consolidation runs PER PARTITION VALUE
    (one tagged output segment each), so manifest-level pruning and
    `commit_upsert_partitioned` survive maintenance. Min/max stats and
    per-segment BLOOMS are dropped for compacted segments by default
    (the skipping columns aren't recorded in the manifest) — point
    lookups degrade to full-segment scans after maintenance unless the
    caller passes `stats_cols` / `bloom_cols`, which regenerate the
    skipping metadata for each consolidated segment at the usual
    commit-time cost (one agg job per kind)."""
    last_err: Exception | None = None
    for _ in range(max_tries):
        versions = _manifest_versions(spark, path)
        if not versions:
            raise ValueError(f"cannot compact an empty manifest lake: {path}")
        base_version = versions[-1]
        base = _read_manifest(spark, path, base_version)
        base_segs = set(base["segments"])
        base_meta = base.get("meta", {})
        part_tags = [base_meta.get(s, {}).get("part") for s in base["segments"]]
        if base["segments"] and all(p is not None for p in part_tags):
            by_part: dict = {}
            for s, p in zip(base["segments"], part_tags):
                by_part.setdefault(tuple(sorted(p.items())), []).append(s)
            groups = [(dict(k), segs) for k, segs in by_part.items()]
        else:
            groups = [(None, list(base["segments"]))]
        new_segs: dict[str, dict] = {}
        for part, group in groups:
            # merge_schema: consolidating schema-evolved segments must
            # keep the union schema, not drop later-added columns
            df = _read_segments(spark, path, group, merge_schema=True)
            seg = _write_segment(df, path, target_files)
            seg_meta: dict = {"part": part} if part is not None else {}
            if stats_cols:
                seg_meta["stats"] = _segment_stats(df, stats_cols)
            if bloom_cols:
                blooms = {c: _segment_bloom(df, c) for c in bloom_cols}
                blooms = {c: b for c, b in blooms.items() if b is not None}
                if blooms:
                    seg_meta["bloom"] = blooms
            new_segs[seg] = seg_meta

        def _segments(parent):
            # verify every commit since `base` was an append; the
            # segment-list diff below is only sound for appends
            m, v = parent, (parent["version"] if parent else 0)
            while v > base_version:
                if m is None or m.get("op") != "append":
                    raise CommitConflict(
                        f"non-append commit v{v} landed after compaction "
                        f"base v{base_version}: re-consolidate"
                    )
                v = m.get("parent") or 0
                try:
                    m = _read_manifest(spark, path, v) if v else None
                except Exception as e:  # intermediate manifest vacuumed
                    raise CommitConflict(str(e))
            extra = [
                s
                for s in (parent["segments"] if parent else [])
                if s not in base_segs
            ]
            return list(new_segs) + extra

        def _meta(parent, segments):
            pm = dict(parent.get("meta", {})) if parent else {}
            out = {s: m for s, m in new_segs.items() if m}
            for s in segments:
                if s not in out and s in pm:
                    out[s] = pm[s]
            return out

        try:
            return _commit(spark, path, "compact", _segments, meta_fn=_meta)
        except CommitConflict as e:
            last_err = e  # snapshot moved non-append-wise: redo
    raise RuntimeError(
        f"compact lost the snapshot race {max_tries} times: {path}"
    ) from last_err


def _read_segments(
    spark: SparkSession,
    path: str,
    segments: list[str],
    merge_schema: bool = False,
) -> DataFrame:
    if not segments:
        raise ValueError("manifest lists no segments (empty table version)")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*[f"{path}/{_DATA_DIR}/{s}" for s in segments])


def _prune_segments(
    manifest: dict,
    part_eq: dict | None,
    ranges: dict | None,
    bloom_probes: dict | None = None,
) -> list[str]:
    """Manifest-level data skipping: drop segments whose metadata PROVES
    they can't match. A segment without the relevant metadata is always
    kept — skipping is sound, never lossy. `bloom_probes` maps column →
    precomputed probe hashes (see `_bloom_probe_hashes`)."""
    segs = manifest["segments"]
    meta = manifest.get("meta", {})
    out = []
    for s in segs:
        m = meta.get(s, {})
        keep = True
        if part_eq:
            part = m.get("part", {})
            for col, want in part_eq.items():
                if col not in part:
                    continue
                have, want_c = part[col], _json_safe(want)
                if have is None or want_c is None:
                    # NULL is its own partition: prune iff exactly one
                    # side is NULL (NULL tag can't hold a non-NULL key
                    # and vice versa)
                    if (have is None) != (want_c is None):
                        keep = False
                        break
                elif _comparable(have, want_c) and have != want_c:
                    keep = False
                    break
                # type-drifted probe (e.g. str '1997' vs int tag): not
                # provably disjoint -> keep, never prune
        if keep and bloom_probes:
            blooms = m.get("bloom", {})
            for col, positions in bloom_probes.items():
                if col in blooms and not _bloom_maybe_contains(
                    blooms[col], positions
                ):
                    keep = False
                    break
        if keep and ranges:
            stats = m.get("stats", {})
            for col, (lo, hi) in ranges.items():
                if col in stats:
                    mn, mx = stats[col]
                    # _provably_lt keeps the segment (returns False) on
                    # any None or write-vs-probe type drift — a str
                    # range against int stats must not raise or prune
                    if _provably_lt(_json_safe(hi), mn):
                        keep = False
                        break
                    if _provably_lt(mx, _json_safe(lo)):
                        keep = False
                        break
        if keep:
            out.append(s)
    return out


def resolve_segments(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    part_eq: dict | None = None,
    ranges: dict | None = None,
    bloom_eq: dict | None = None,
) -> list[str]:
    """The segment list a read would scan after manifest-level pruning
    (exposed for tests/introspection — the pruning IS the point)."""
    versions = _manifest_versions(spark, path)
    if not versions:
        raise ValueError(f"no committed manifest under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in committed versions {versions}")
    probes = (
        {c: _bloom_probe_hashes(spark, val) for c, val in bloom_eq.items()}
        if bloom_eq
        else None
    )
    return _prune_segments(_read_manifest(spark, path, v), part_eq, ranges, probes)


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    merge_schema: bool = False,
    part_eq: dict | None = None,
    ranges: dict | None = None,
    bloom_eq: dict | None = None,
) -> DataFrame:
    """The table AS OF `version` (default: latest). One manifest read,
    then a plain multi-dir parquet scan — pushdown/pruning intact.

    Schema evolution: segments are immutable, so adding a column is
    just appending segments with the wider schema; `merge_schema=True`
    unions footers across segments (old segments surface NULLs for new
    columns — additive evolution only, the parquet mergeSchema
    contract).

    `part_eq` / `ranges` prune segments through manifest metadata
    BEFORE Spark lists any file (driver-side skipping); they are hints
    only — rows from kept segments are NOT re-filtered, so apply the
    same predicate in the plan too (Catalyst then also pushes it into
    the surviving scans)."""
    versions = _manifest_versions(spark, path)
    if not versions:
        raise ValueError(f"no committed manifest under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in committed versions {versions}")
    probes = (
        {c: _bloom_probe_hashes(spark, val) for c, val in bloom_eq.items()}
        if bloom_eq
        else None
    )
    segs = _prune_segments(_read_manifest(spark, path, v), part_eq, ranges, probes)
    return _read_segments(spark, path, segs, merge_schema)


def commit_upsert(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    keys: list[str],
    version_col: str,
    target_files: int | None = None,
    max_tries: int = 5,
    allow_untag: bool = False,
) -> int:
    """MERGE (SCD1 last-writer-wins upsert) into the manifest lake:
    read the current snapshot, fold `changes` with
    ``operators.cdc.merge_upsert``, publish the merged table as a new
    snapshot. Because the new segment's CONTENT depends on the parent
    snapshot, the commit is a strict CAS on that parent
    (`expected_parent`); losing the race re-reads and re-merges rather
    than committing stale data — the orphaned segment of a lost
    attempt is invisible and vacuumable.

    Scale note (documented trade): this rewrites the TABLE as one
    consolidated snapshot — correct and simple, right for dimension
    tables and MV publishes. For fact tables use
    `commit_upsert_partitioned` (touched partitions only) or
    `commit_upsert_pruned` (stats-overlap segments only). The
    full-rewrite op doesn't mix with a tagged layout: its consolidated
    segment is UNTAGGED, so running it on a partition-tagged lake
    FORFEITS pruning and partitioned MERGE — that's a hard error now
    (quiet pruning regressions on a fact table are worse than a
    retried call); pass ``allow_untag=True`` to opt into the
    downgrade deliberately."""
    from ..operators.cdc import merge_upsert

    last_err: Exception | None = None
    for _ in range(max_tries):
        base_version = current_version(spark, path)
        if base_version is not None and not allow_untag:
            m = _read_manifest(spark, path, base_version)
            tagged = [
                s for s in m["segments"]
                if "part" in m.get("meta", {}).get(s, {})
            ]
            if tagged:
                raise ValueError(
                    f"commit_upsert on a partition-tagged lake ({len(tagged)} "
                    "tagged segments) would forfeit partition pruning and "
                    "partitioned MERGE — use commit_upsert_partitioned, or "
                    f"pass allow_untag=True to untag deliberately: {path}"
                )
        if base_version is None:
            # empty lake: an upsert is just the changes, latest per key
            merged = merge_upsert(
                changes.limit(0).drop(version_col), changes, keys, version_col
            )
        else:
            base = read_snapshot(spark, path, version=base_version)
            merged = merge_upsert(base, changes, keys, version_col)
        seg = _write_segment(merged, path, target_files)
        try:
            return _commit(
                spark,
                path,
                "upsert",
                lambda parent: [seg],
                expected_parent=base_version or 0,
            )
        except CommitConflict as e:
            last_err = e  # re-read the moved snapshot and re-merge
    raise RuntimeError(
        f"commit_upsert lost the snapshot race {max_tries} times: {path}"
    ) from last_err


def commit_upsert_partitioned(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    keys: list[str],
    version_col: str,
    part_col: str,
    target_files: int | None = None,
    max_tries: int = 5,
    check_stable_partitions: bool = True,
) -> int:
    """Fact-scale MERGE: rewrite ONLY the partitions the changes touch.
    Requires every current segment to carry ``part`` metadata for
    `part_col` (i.e. the lake was written partition-tagged) — raises
    otherwise, because an untagged segment could hide rows of a touched
    partition and silently survive un-merged.

    **`part_col` must be immutable per key** (the standard
    partition-scoped-MERGE contract): a change row that moves a key to
    a different partition would leave the stale row alive in its old,
    untouched partition — two rows per key. With
    `check_stable_partitions=True` (default) that is ENFORCED: one
    key-columns-only semi-join of the change keys against the
    untouched segments (column-pruned scan) raises on any hit. At
    fact scale, callers whose pipeline guarantees key→partition
    stability (e.g. the partition is derived from the key) pass
    ``check_stable_partitions=False`` to skip the scan.

    Shape: the touched partition set is an O(partitions-in-batch)
    driver list (one distinct job over the CHANGES, which are
    batch-sized by premise); untouched segments transfer into the new
    manifest by name — zero data movement; touched partitions read ←
    merge_upsert ← write one fresh tagged segment each. The commit is
    the same strict parent CAS as `commit_upsert`: racing commits force
    a re-read + re-merge, so concurrent appends are never lost. This is
    the file-level-skipping MERGE that `commit_upsert`'s docstring
    points to — at 100 TB a CDC batch touching 3 of 10,000 daily
    partitions rewrites 3."""
    from pyspark.sql import functions as F

    from ..operators.cdc import merge_upsert

    last_err: Exception | None = None
    for _ in range(max_tries):
        base_version = current_version(spark, path)
        parts = [
            _json_safe(r[part_col])
            for r in changes.select(part_col).distinct().collect()
        ]
        touched: list[str] = []
        untouched: list[str] = []
        meta: dict = {}
        if base_version is not None:
            m = _read_manifest(spark, path, base_version)
            meta = m.get("meta", {})
            for s in m["segments"]:
                part = meta.get(s, {}).get("part", {})
                if part_col not in part:
                    raise ValueError(
                        f"segment {s} lacks '{part_col}' partition metadata — "
                        "partitioned upsert requires a fully partition-tagged "
                        "lake (write with commit_append(partition=...))"
                    )
                (touched if part[part_col] in parts else untouched).append(s)
        if untouched and check_stable_partitions:
            stray = (
                _read_segments(spark, path, untouched)
                .select(*keys)
                .join(changes.select(*keys).distinct(), on=list(keys), how="left_semi")
                .limit(1)
                .count()
            )
            if stray:
                raise ValueError(
                    "partition-scoped MERGE key-stability violation: a change "
                    f"key exists in an untouched partition of {path} — the "
                    f"change row moves the key across '{part_col}' values, "
                    "which would leave its stale row alive. Partition values "
                    "must be immutable per key; delete+insert across "
                    "partitions explicitly, or fix the change batch."
                )
        if touched:
            base = _read_segments(spark, path, touched)
            merged = merge_upsert(base, changes, keys, version_col)
        else:
            merged = merge_upsert(
                changes.limit(0).drop(version_col), changes, keys, version_col
            )
        merged = merged.localCheckpoint(eager=True)  # read before any delete
        new_segs: dict[str, dict] = {}
        for p in parts:
            seg = _write_segment(  # eqNullSafe: NULL is a valid partition
                merged.filter(F.col(part_col).eqNullSafe(F.lit(p))),
                path,
                target_files,
            )
            new_segs[seg] = {"part": {part_col: p}}

        def _segments(parent):
            return untouched + list(new_segs)

        def _meta(parent, segments):
            out = {s: meta[s] for s in untouched if s in meta}
            out.update(new_segs)
            return out

        try:
            return _commit(
                spark,
                path,
                "upsert_partitioned",
                _segments,
                expected_parent=base_version or 0,
                meta_fn=_meta,
            )
        except CommitConflict as e:
            last_err = e
    raise RuntimeError(
        f"commit_upsert_partitioned lost the snapshot race {max_tries} times: {path}"
    ) from last_err


def manifest_append_sink(path: str, target_files: int | None = None):
    """foreachBatch function: EXACTLY-ONCE streaming append into the
    manifest lake. Each micro-batch commits as one atomic manifest
    version carrying the idempotency tag ``batch=<id>``; a replayed
    batch (at-least-once delivery after a crash between the commit and
    the checkpoint write) finds its tag in the cumulative tag set and
    skips — no double-append, no partial visibility (a crash before
    the manifest rename leaves only an invisible orphan segment).

    This is the missing half of the batch-dir sinks: readers of the
    manifest lake see each batch atomically and never need the
    maintenance-window rule; compaction/vacuum run concurrently."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tag = f"batch={batch_id}"
        if tag in committed_tags(spark, path):
            return  # replay of an already-committed batch
        commit_append(spark, path, batch_df, target_files=target_files, tag=tag)

    return _apply


def snapshot_diff(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    keys: list[str],
) -> DataFrame:
    """Change data feed between two table versions: one row per changed
    key with op ∈ {insert, delete, update} — what a downstream
    incremental consumer (MV maintenance, replication, CDC export)
    reads INSTEAD of diffing full snapshots itself.

    Shape: ONE null-safe full-outer join of the two snapshots on the
    key (both sides prune/pushdown as normal scans), per-column
    null-safe comparison for the update test — no row hashing, no
    driver state. At 100 TB: key-partition both reads (the snapshots
    share segment layout for untouched partitions, and AQE handles the
    usually-small changed side). Unchanged rows leave the plan at the
    join's filter — the output is O(changes)."""
    from pyspark.sql import functions as F

    a = read_snapshot(spark, path, version=v_from).withColumn("__in_a", F.lit(1))
    b = read_snapshot(spark, path, version=v_to).withColumn("__in_b", F.lit(1))
    val_cols = [c for c in b.columns if c not in keys and c != "__in_b"]
    cond = None
    for k in keys:
        c = a[k].eqNullSafe(b[k])
        cond = c if cond is None else (cond & c)
    j = a.join(b, cond, "full_outer")
    changed = None
    for c in val_cols:
        if c in a.columns:
            d = ~a[c].eqNullSafe(b[c])
            changed = d if changed is None else (changed | d)
    op = (
        F.when(a["__in_a"].isNull(), F.lit("insert"))
        .when(b["__in_b"].isNull(), F.lit("delete"))
        .when(changed if changed is not None else F.lit(False), F.lit("update"))
    )
    out_keys = [F.coalesce(a[k], b[k]).alias(k) for k in keys]
    return (
        j.select(*out_keys, op.alias("op"))
        .filter(F.col("op").isNotNull())
    )


def current_version(spark: SparkSession, path: str) -> int | None:
    versions = _manifest_versions(spark, path)
    return versions[-1] if versions else None


def vacuum(spark: SparkSession, path: str, keep_versions: int = 2) -> int:
    """Drop manifests older than the newest `keep_versions` and delete
    every data segment no retained manifest references — including
    orphans from crashed writers. Returns segments deleted. Run only
    when no reader can be pinned to an expired version (the usual
    table-format retention contract)."""
    versions = _manifest_versions(spark, path)
    if not versions:
        return 0
    keep = versions[-keep_versions:]
    fs, _ = _fs(spark, path)
    live: set[str] = set()
    ever_committed: set[str] = set()  # referenced by ANY manifest, incl. expired
    for v in versions:
        segs = _read_manifest(spark, path, v)["segments"]
        ever_committed.update(segs)
        if v in keep:
            live.update(segs)
    for v in versions:
        if v not in keep:
            fs.delete(_jpath(spark, f"{path}/{_MANIFEST_DIR}/v{v:08d}.json"), False)
    # stray tmp manifests from crashed commits — but only STALE ones:
    # a fresh .tmp may belong to an in-flight concurrent commit whose
    # rename hasn't happened yet; deleting it would turn that writer's
    # clean CAS loss into a FileNotFound error. 10 minutes is far past
    # any write-to-rename window (the tmp write is one small file).
    now_ms = spark._jvm.java.lang.System.currentTimeMillis()
    mdir = f"{path}/{_MANIFEST_DIR}"
    for st in fs.listStatus(_jpath(spark, mdir)):
        name = st.getPath().getName()
        if not name.startswith(".tmp-"):
            continue
        if now_ms - st.getModificationTime() > 600_000:
            fs.delete(st.getPath(), False)
        else:
            # surviving fresh tmp: whatever segments it references may
            # commit any moment — treat them as live
            try:
                stream = fs.open(st.getPath())
                try:
                    content = spark._jvm.org.apache.commons.io.IOUtils.toString(
                        stream, "UTF-8"
                    )
                finally:
                    stream.close()
                live.update(json.loads(content).get("segments", []))
            except Exception:
                pass  # torn/unreadable tmp: its segments stay age-guarded
    ddir = f"{path}/{_DATA_DIR}"
    jddir = _jpath(spark, ddir)
    n = 0
    if fs.exists(jddir):
        for st in fs.listStatus(jddir):
            name = st.getPath().getName()
            if name in live:
                continue
            # expired-version segments (were committed, their manifest
            # just aged out) reclaim immediately; a NEVER-referenced
            # segment is deleted only when stale — a fresh one is
            # (likely) an in-flight commit between its data write and
            # its manifest rename, and deleting it would dangle the
            # winner's manifest.
            if name in ever_committed or now_ms - st.getModificationTime() > 600_000:
                fs.delete(st.getPath(), True)
                n += 1
    return n
