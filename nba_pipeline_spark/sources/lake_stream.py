"""Structured Streaming source over the manifest lake:
``spark.readStream.format("manifest_stream").load(path)``.

Delta ``readStream`` parity for the append-only case: offsets are
TABLE VERSIONS (the engine checkpoints them, so restarts resume
exactly after the last committed version), each micro-batch emits the
segments newly appended in ``(start, end]``, one input partition per
parquet file (executor-side pyarrow scan — the driver never touches
data), and every row carries its ``_commit_version`` for attribution.

Non-append commits (MERGE, delete, replace, compaction) rewrite or
remove rows and cannot stream incrementally without retraction — the
source RAISES on them, like Delta without ``ignoreChanges``; pass
``.option("ignore_changes", "true")`` to skip those versions entirely
(coarser than Delta's ignoreChanges, which re-emits rewritten files —
skipping is the honest semantics when downstream can't dedup). For
retraction-aware consumers use the valued change feed
(`manifest.snapshot_diff` / `consume_feed`) instead.

Metadata access is plain-filesystem JSON (KB manifests); data access
is pyarrow parquet in executors. At 100 TB the per-trigger work is
O(newly appended files) — the same floor as Spark's own file-stream
source, minus its unbounded seen-file ledger (the version offset IS
the ledger).

Schema comes from the manifest's recorded schema (commit-time schema
enforcement stamps it; sources/manifest.py). Files predating an
additive evolution null-fill the missing columns with their
manifest-recorded types (failing would wedge the stream permanently);
the stream's OWN output schema is pinned at start — widen it by
restarting, the usual streaming-source contract.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"

# Spark simpleString -> pyarrow type, for null-filling columns a
# pre-evolution file lacks. Exotic nested types raise — a lake whose
# evolution adds nested columns needs a re-bootstrap, stated loudly.
_PA_TYPES = {
    "tinyint": "int8", "smallint": "int16", "int": "int32",
    "bigint": "int64", "float": "float32", "double": "float64",
    "string": "string", "boolean": "bool_", "date": "date32",
    "binary": "binary",
}


def _pa_type(simple: str, fname: str, col: str):
    import pyarrow as pa

    if simple in _PA_TYPES:
        return getattr(pa, _PA_TYPES[simple])()
    if simple.startswith("decimal("):
        p, sc = simple[8:-1].split(",")
        return pa.decimal128(int(p), int(sc))
    if simple.startswith("timestamp"):
        return pa.timestamp("us")
    raise ValueError(
        f"manifest_stream: cannot null-fill column {col!r} of type "
        f"{simple!r} missing from pre-evolution file {fname} — "
        "re-bootstrap the stream from a snapshot"
    )


def _versions(path: str) -> list[int]:
    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def _manifest(path: str, v: int) -> dict:
    with open(os.path.join(path, _MANIFEST_DIR, f"v{v:08d}.json")) as fh:
        return json.load(fh)


def _schema_ddl(path: str) -> str:
    vs = _versions(path)
    if not vs:
        raise ValueError(f"manifest_stream: no commits at {path}")
    sch = _manifest(path, vs[-1]).get("props", {}).get("schema")
    if not sch:
        raise ValueError(
            f"manifest_stream: lake at {path} has no recorded schema "
            "(pre-enforcement lake) — make one write so the schema is "
            "probed and stamped, then restart the stream"
        )
    cols = ", ".join(f"{n} {t}" for n, t in sch["cols"])
    return cols + ", _commit_version int"


class ManifestStreamDataSource(DataSource):
    """format("manifest_stream") — streaming reads of lake appends."""

    def __init__(self, options=None) -> None:
        super().__init__(options or {})

    @classmethod
    def name(cls) -> str:
        return "manifest_stream"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("manifest_stream requires a path option")
        return _schema_ddl(path)

    def streamReader(self, schema) -> "ManifestStreamReader":
        return ManifestStreamReader(self.options)


class ManifestStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("manifest_stream requires a path option")
        self._path = path
        self._ignore_changes = (
            str(options.get("ignore_changes", "false")).lower() == "true"
        )

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        vs = _versions(self._path)
        return {"version": vs[-1] if vs else 0}

    def _new_files(self, v: int) -> list[tuple[str, int]]:
        """(parquet file, version) pairs appended by version v; raises
        (or skips under ignore_changes) for non-append commits."""
        cur = _manifest(self._path, v)
        prev_segs: set = set()
        prev_dels: list = []
        if v > 1:
            prev = _manifest(self._path, v - 1)
            prev_segs = set(prev["segments"])
            prev_dels = list(prev.get("deletes", []))
        removed = prev_segs - set(cur["segments"])
        if removed or list(cur.get("deletes", [])) != prev_dels:
            if self._ignore_changes:
                return []
            raise ValueError(
                f"manifest_stream: version {v} ({cur.get('op')}) is not "
                "append-only (segments removed or tombstones changed) — "
                "restart from a snapshot, or set ignore_changes=true to "
                "skip such commits, or consume the valued change feed"
            )
        out = []
        for s in cur["segments"]:
            if s in prev_segs:
                continue
            seg_dir = (
                s if ("://" in s or s.startswith("/"))
                else os.path.join(self._path, _DATA_DIR, s)
            )
            for f in sorted(os.listdir(seg_dir)):
                if f.endswith(".parquet"):
                    out.append((os.path.join(seg_dir, f), v))
        return out

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start.get("version", 0)), int(end.get("version", 0))
        # schema pinned AT PLANNING from the batch's end version and
        # shipped inside each partition: an executor must never resolve
        # "latest" itself (a replace landing mid-batch would swap the
        # column set under a running task)
        sch = _manifest(self._path, hi).get("props", {}).get("schema") if hi else None
        cols = [list(p) for p in sch["cols"]] if sch else []
        parts = []
        for v in range(lo + 1, hi + 1):
            parts.extend(
                InputPartition((f, ver, cols)) for f, ver in self._new_files(v)
            )
        # an all-skipped range still needs >=1 (empty) partition: the
        # engine requires a non-empty partition list for a planned batch
        return parts or [InputPartition(None)]

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if partition.value is None:
            return
        fname, version, sch_cols = partition.value
        t = pq.read_table(fname)
        have = set(t.column_names)
        cols = []
        for n, typ in sch_cols:
            if n in have:
                cols.append(t.column(n))
            else:
                # file predates an additive evolution: null-fill with
                # the manifest-recorded type (failing here would wedge
                # the stream permanently — no restart can add columns
                # to an old file)
                cols.append(pa.nulls(t.num_rows, _pa_type(typ, fname, n)))
        out = pa.table(cols, names=[n for n, _ in sch_cols])
        out = out.append_column(
            "_commit_version", pa.array([version] * t.num_rows, pa.int32())
        )
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass  # the engine's checkpointed offset is the only state


def register_lake_stream(spark) -> None:
    """Idempotent registration of format("manifest_stream")."""
    spark.dataSource.register(ManifestStreamDataSource)
