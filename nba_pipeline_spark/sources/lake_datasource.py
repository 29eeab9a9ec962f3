"""Batch Spark 4 Python DataSource over the manifest lake:
``spark.read.format("manifest_lake").option("path", p).load()``.

The SQL-surface mount for the table format: Catalyst's own filter
pushdown (``spark.sql.python.filterPushdown.enabled``) delivers the
query's predicates to ``pushFilters``, which turns them into the SAME
manifest probes the programmatic API takes — equality → partition-tag
+ range, inequalities → min/max ranges, ``IN`` → the point-in-range
bisect — so a plain ``.where(...)`` prunes segments BEFORE any file is
listed, with no caller-passed ``part_eq=/ranges=`` at all. Surviving
files then re-apply the predicates inside pyarrow (row-group stats +
row filtering), and Spark re-evaluates them post-scan: every filter is
returned as unhandled, so pruning is a pure hint and semantics never
depend on it.

Planning runs in a Python worker with no Py4J gateway (same constraint
as the streaming source — sources/lake_stream.py), so everything here
goes through pyarrow.fs + the KB-sized JSON manifests; the pruning
logic itself is imported from sources/manifest.py (pure-Python
functions, engine-free). Bloom probes are the one skip NOT available
on this path: hashing a probe needs an engine job (xxhash64 semantics
are not reimplemented — see manifest._bloom_probe_hashes), which
planning here cannot run. Point lookups that need blooms use
``read_for_keys``/``read_snapshot`` instead.

Honest gates: merge-on-read tombstones need an anti-join this
per-file reader cannot express — a tombstoned lake RAISES with
``read_snapshot`` guidance. ``option("version", N)`` time-travels;
the manifest is pinned at planning so a concurrent commit can't swap
files under a running scan (snapshot isolation, same as the
programmatic reader).

Column mapping: files hold PHYSICAL names; this reader emits LOGICAL
ones and translates pushed predicates before probing, like every
other read path. Pre-evolution files null-fill additive columns with
their manifest-recorded types.

Performance position: the JVM parquet scan (``read_snapshot``) is the
hot path — vectorized, codegen'd, zero Python. This source trades
that for pushdown-through-SQL convenience at Arrow-batch speed (the
same trade the streaming source already makes); use it where the
consumer is ad-hoc SQL, not the inner loop.

HANDLE-REUSE CAVEAT (upstream Spark 4.1 behavior, verified against
this engine and against the stock Python-DataSource example): the JVM
side caches the planned read (``PythonDataSourceV2.readInfo``) per
``load()`` relation, and a filtered query's pushdown REPLACES that
cache — a later UNFILTERED (or differently-shaped) query on the SAME
DataFrame handle can silently reuse the pruned plan and drop rows.
This affects every Python DataSource with pushFilters under
``spark.sql.python.filterPushdown.enabled``, not just this one.
Contract: take a FRESH ``load()`` per query — ``read_lake`` below
does exactly that and is the recommended entry point. Pinned in
tests/test_lake_datasource.py.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from .lake_stream import (
    _DATA_DIR,
    _join,
    _manifest,
    _pa_type,
    _pafs,
    _schema_triples_at,
    _versions,
)


def _pinned_version(path: str, options) -> int:
    vs = _versions(path)
    if not vs:
        raise ValueError(f"manifest_lake: no commits at {path}")
    v = options.get("version")
    if v is None:
        return vs[-1]
    v = int(v)
    if v not in vs:
        raise ValueError(
            f"manifest_lake: version {v} not in committed versions {vs}"
        )
    return v


class ManifestLakeDataSource(DataSource):
    """format("manifest_lake") — batch snapshot reads with manifest
    pruning driven by Catalyst's pushed filters."""

    def __init__(self, options=None) -> None:
        super().__init__(options or {})

    @classmethod
    def name(cls) -> str:
        return "manifest_lake"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("manifest_lake requires a path option")
        v = _pinned_version(path, self.options)
        sch = _manifest(path, v).get("props", {}).get("schema")
        if not sch:
            raise ValueError(
                f"manifest_lake: lake at {path} has no recorded schema "
                "(pre-enforcement lake) — make one write so the schema "
                "is probed and stamped"
            )
        return ", ".join(f"{n} {t}" for n, t in sch["cols"])

    def reader(self, schema) -> "ManifestLakeReader":
        return ManifestLakeReader(self.options)


class ManifestLakeReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("manifest_lake requires a path option")
        self._path = path
        self._version = _pinned_version(path, options)
        # pinned at planning: snapshot isolation for the whole scan
        self._m = _manifest(path, self._version)
        if self._m.get("deletes"):
            raise ValueError(
                "manifest_lake: lake has merge-on-read tombstones — the "
                "per-file reader cannot apply the anti-join; read it via "
                "manifest.read_snapshot (or compact to materialize the "
                f"deletes): {path}"
            )
        # pushed-probe state, in LOGICAL column names
        self._part_eq: dict = {}
        self._lo: dict = {}
        self._hi: dict = {}
        self._keys: dict = {}
        # exact per-file re-filter payload: (logical col, op, value)
        self._row_filters: list = []

    # -------------------------------------------------- filter intake

    def pushFilters(self, filters):
        """Translate Catalyst's pushed predicates into manifest probes.
        ALL filters are yielded back (unsupported): the engine keeps
        evaluating them post-scan, so pruning stays a sound hint — a
        dropped probe can only cost speed, never rows."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        # RESET per plan: Spark may reuse one reader instance across
        # several queries over the same loaded DataFrame, calling
        # pushFilters once per scan — probes from the previous plan
        # must not leak into this one
        self._part_eq, self._lo, self._hi = {}, {}, {}
        self._keys, self._row_filters = {}, []

        def col_of(f):
            # nested attributes (a.b) have no manifest metadata — skip
            return f.attribute[0] if len(f.attribute) == 1 else None

        for f in filters:
            c = col_of(f)
            if c is not None:
                if isinstance(f, EqualTo) and f.value is not None:
                    self._part_eq[c] = f.value
                    self._lo[c] = max_or(self._lo.get(c), f.value)
                    self._hi[c] = min_or(self._hi.get(c), f.value)
                    self._row_filters.append((c, "eq", f.value))
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    if f.value is not None:
                        self._lo[c] = max_or(self._lo.get(c), f.value)
                        self._row_filters.append(
                            (c, "gt" if isinstance(f, GreaterThan) else "ge",
                             f.value)
                        )
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    if f.value is not None:
                        self._hi[c] = min_or(self._hi.get(c), f.value)
                        self._row_filters.append(
                            (c, "lt" if isinstance(f, LessThan) else "le",
                             f.value)
                        )
                elif isinstance(f, In):
                    vals = [v for v in f.value if v is not None]
                    if vals:
                        self._keys[c] = vals
                        self._row_filters.append((c, "in", vals))
            yield f  # unhandled: Spark re-evaluates everything

    # ------------------------------------------------------- planning

    def partitions(self):
        from .manifest import _prune_segments, _sortable_keys

        props = self._m.get("props", {})
        cm = dict(props.get("colmap", {}))

        def phys(d: dict) -> dict:
            return {cm.get(c, c): v for c, v in d.items()}

        # CONSUME the pushed probes: Spark keeps one reader instance
        # alive across scans of the same loaded DataFrame and only
        # calls pushFilters when a scan HAS filters — an unfiltered
        # scan planned after a filtered one must not inherit its
        # pruning (that would drop rows, not just speed). pushFilters
        # stores, partitions() takes-and-clears; the engine plans
        # push→partitions as one sequential step per scan.
        part_eq, lo, hi = self._part_eq, self._lo, self._hi
        keys, row_filters = self._keys, self._row_filters
        self._part_eq, self._lo, self._hi = {}, {}, {}
        self._keys, self._row_filters = {}, []
        ranges = {
            c: (lo.get(c), hi.get(c)) for c in set(lo) | set(hi)
        }
        segs = _prune_segments(
            self._m,
            phys(part_eq) or None,
            phys(ranges) or None,
            None,  # bloom probes need an engine job — unavailable here
            _sortable_keys(phys(keys)),
        )
        cols = _schema_triples_at(self._path, self._version)
        row_filters = [
            (cm.get(c, c), op, val) for c, op, val in row_filters
        ]
        from pyarrow import fs as pafs

        fs, norm = _pafs(self._path)
        parts = []
        for s in self._m["segments"]:
            if s not in segs:
                continue
            if "://" in s:
                dir_uri = s
                seg_fs, seg_dir = _pafs(s)
            elif s.startswith("/"):
                dir_uri = s
                seg_fs, seg_dir = fs, s
            else:
                dir_uri = _join(self._path, _DATA_DIR, s)
                seg_fs, seg_dir = fs, _join(norm, _DATA_DIR, s)
            infos = seg_fs.get_file_info(pafs.FileSelector(seg_dir))
            for info in sorted(infos, key=lambda i: i.base_name):
                if info.base_name.endswith(".parquet"):
                    parts.append(
                        InputPartition((
                            _join(dir_uri, info.base_name),
                            cols,
                            row_filters,
                        ))
                    )
        return parts or [InputPartition(None)]

    # ------------------------------------------------- executor read

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if partition.value is None:
            return
        fname, sch_cols, row_filters = partition.value
        fs, norm = _pafs(fname)
        pf = pq.ParquetFile(norm, filesystem=fs)
        have = set(pf.schema_arrow.names)
        expr = _arrow_expr(
            [(c, op, v) for c, op, v in row_filters if c in have]
        )
        try:
            t = pq.read_table(norm, filesystem=fs, filters=expr)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, TypeError):
            # type-drifted predicate pyarrow can't evaluate: fall back
            # to the unfiltered read — Spark re-applies every filter
            t = pq.read_table(norm, filesystem=fs)
        cols = []
        for n, typ, phys_name in sch_cols:
            if phys_name in t.column_names:
                cols.append(t.column(phys_name))
            else:  # pre-evolution file: null-fill, manifest-typed
                cols.append(pa.nulls(t.num_rows, _pa_type(typ, fname, n)))
        yield from pa.table(
            cols, names=[n for n, _, _ in sch_cols]
        ).to_batches()


def max_or(a, b):
    """Tightest lower bound; unprovable comparisons keep the looser
    one (pruning must stay sound under mixed-type predicates)."""
    if a is None:
        return b
    try:
        return a if a > b else b
    except TypeError:
        return a


def min_or(a, b):
    if a is None:
        return b
    try:
        return a if a < b else b
    except TypeError:
        return a


def _arrow_expr(filters):
    import pyarrow.dataset as pads

    expr = None
    for c, op, v in filters:
        f = pads.field(c)
        if op == "eq":
            e = f == v
        elif op == "gt":
            e = f > v
        elif op == "ge":
            e = f >= v
        elif op == "lt":
            e = f < v
        elif op == "le":
            e = f <= v
        elif op == "in":
            e = f.isin(v)
        else:  # pragma: no cover - op set is closed above
            continue
        expr = e if expr is None else expr & e
    return expr


def register_lake_source(spark) -> None:
    """Idempotent registration of format("manifest_lake"); turns on
    the engine-wide Python-source filter pushdown flag (a reader that
    implements pushFilters fails analysis while it's off)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ManifestLakeDataSource)


def read_lake(spark, path: str, version: int | None = None):
    """A FRESH ``format("manifest_lake")`` DataFrame — one relation
    per call, which is the safe usage under the engine's per-relation
    plan cache (see the module docstring's handle-reuse caveat):
    derive exactly ONE query from each returned handle."""
    register_lake_source(spark)
    r = spark.read.format("manifest_lake").option("path", path)
    if version is not None:
        r = r.option("version", str(version))
    return r.load()
