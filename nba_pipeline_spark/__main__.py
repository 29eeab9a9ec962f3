"""CLI entry point — the scheduler-boundary wrapper the reference
exposes through Airflow DAG triggers (scrape_data_to_gcs.py:199-215:
one DAG per dataset, PythonOperator chains). Here the same boundary is
``spark-submit -m nba_pipeline_spark`` / ``python -m nba_pipeline_spark``:

    python -m nba_pipeline_spark query q_flagship [sf_dir] [-n 20]
    python -m nba_pipeline_spark list
    python -m nba_pipeline_spark pipeline all --out /tmp/lake
    python -m nba_pipeline_spark pipeline games --out /tmp/lake

``pipeline`` runs the dataset builders through the dependency-ordered
runner (pipelines/runner.py — retries, upstream-failed skip) over the
recorded fixture frames, writing the partitioned lake the reference's
DAGs produce in GCS/BigQuery. ``query`` executes any registered plan
against a testdata scale dir.
"""

from __future__ import annotations

import argparse
import sys


def _spark():
    from .session import get_spark

    return get_spark("nba-pipeline-cli")


def cmd_list(_args) -> int:
    from .plans.queries import REGISTRY

    for name, spec in REGISTRY.items():
        kind = "oracle" if spec.oracle else "rows-only"
        print(f"{name}\t{kind}")
    return 0


def cmd_query(args) -> int:
    from .plans.queries import REGISTRY

    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r} — see `list`", file=sys.stderr)
        return 2
    spark = _spark()
    df = REGISTRY[args.name].fn(spark, args.sf_dir)
    df.show(args.n, truncate=False)
    return 0


def cmd_pipeline(args) -> int:
    from .pipelines import fixtures as FX
    from .pipelines.lake import build_lake
    from .pipelines.runner import Dag, Task

    spark = _spark()

    def run_lake(_ctx) -> int:
        frames = build_lake(
            spark,
            args.out,
            FX.games_raw(spark),
            FX.playbyplay_raw(spark),
            FX.boxscores_raw(spark),
            FX.coaches_raw(spark),
            FX.salary_raw_current(spark),
            FX.salary_raw_history(spark),
            FX.players_info_raw(spark),
        )
        return sum(df.count() for df in frames.values())

    if args.dataset == "all":
        dag = Dag("lake", [Task("build_lake", run_lake, retries=1)])
    else:
        builders = {
            "games": lambda c: FX.games_raw(spark),
            "playbyplay": lambda c: FX.playbyplay_raw(spark),
            "boxscores": lambda c: FX.boxscores_raw(spark),
            "coaches": lambda c: FX.coaches_raw(spark),
            "salary": lambda c: FX.salary_raw_current(spark),
            "players": lambda c: FX.players_info_raw(spark),
        }
        if args.dataset not in builders:
            print(f"unknown dataset {args.dataset!r}", file=sys.stderr)
            return 2
        transforms = {
            "games": lambda c: __import__(
                "nba_pipeline_spark.pipelines.games", fromlist=["build_games"]
            ).build_games(c["ingest"], spark),
            "playbyplay": lambda c: __import__(
                "nba_pipeline_spark.pipelines.playbyplay", fromlist=["build_playbyplay"]
            ).build_playbyplay(c["ingest"]),
            "boxscores": lambda c: __import__(
                "nba_pipeline_spark.pipelines.boxscores", fromlist=["build_boxscores"]
            ).build_boxscores(c["ingest"]),
            "coaches": lambda c: __import__(
                "nba_pipeline_spark.pipelines.coaches", fromlist=["build_coaches"]
            ).build_coaches(c["ingest"]),
            "salary": lambda c: __import__(
                "nba_pipeline_spark.pipelines.salary", fromlist=["build_salaries"]
            ).build_salaries(c["ingest"], FX.salary_raw_history(spark), 1997),
            "players": lambda c: __import__(
                "nba_pipeline_spark.pipelines.player_info", fromlist=["build_players"]
            ).build_players(c["ingest"]),
        }

        def write(c):
            out = c["transform"]
            frames = out if isinstance(out, tuple) else (out,)
            n = 0
            for i, df in enumerate(frames):
                df.write.mode("overwrite").parquet(
                    f"{args.out}/{args.dataset}" + (f"_{i}" if i else "")
                )
                n += df.count()
            return n

        dag = Dag(
            args.dataset,
            [
                Task("ingest", builders[args.dataset], retries=1),
                Task("transform", transforms[args.dataset], deps=("ingest",)),
                Task("write", write, deps=("transform",)),
            ],
        )
    run = dag.run()
    for tr in run.runs.values():
        print(f"{tr.name}: {tr.state}")
    return 0 if run.ok else 1


def cmd_publish(args) -> int:
    """Gated publish: expectations over the input, pass rows to the
    lake (a manifest-lake commit with --manifest, else plain parquet),
    fail rows to quarantine with their rule tags, report to stdout.
    The production replacement for swallow-and-continue ingest error
    handling (reference: games.py:21-27)."""
    import json

    from pyspark.sql import functions as F

    from .operators.expectations import publish_with_quarantine

    spark = _spark()
    df = spark.read.parquet(args.input)
    rules = {}
    for spec in args.rule:
        name, _, expr = spec.partition(":")
        if not expr:
            print(f"bad --rule {spec!r} (want name:sql_expr)", file=sys.stderr)
            return 2
        rules[name] = F.expr(expr)
    if not rules:
        rules = {f"{c}_not_null": F.col(c).isNotNull() for c in df.columns}

    writer = None
    if args.manifest:
        from .sources.manifest import commit_append

        writer = lambda passed: commit_append(spark, args.lake, passed)

    rep = publish_with_quarantine(
        df, rules, args.lake, args.quarantine, lake_writer=writer
    )
    report = {
        "passed": rep["__passed"],
        "quarantined": rep["__quarantined"],
        "rules": {k: v for k, v in rep.items() if not k.startswith("__") and v > 0},
    }
    if "__lake_version" in rep:
        report["lake_version"] = rep["__lake_version"]
    print(json.dumps(report))
    if args.strict and report["quarantined"] > 0:
        return 3
    return 0


def cmd_lake(args) -> int:
    """Manifest-lake maintenance: history / compact / vacuum — the
    table-format operator's toolbox (run between or during reads; no
    maintenance window thanks to snapshot isolation)."""
    import json

    from .sources import manifest as M

    spark = _spark()
    if args.action == "history":
        out = []
        for v in M._manifest_versions(spark, args.path):
            m = M._read_manifest(spark, args.path, v)
            out.append(
                {
                    "version": v,
                    "op": m.get("op"),
                    "parent": m.get("parent"),
                    "n_segments": len(m.get("segments", [])),
                    "n_tags": len(m.get("tags", [])),
                }
            )
        print(json.dumps(out))
        return 0
    if args.action == "compact":
        if args.part:
            k, _, raw = args.part.partition("=")
            if not raw:
                print("bad --part (want col=value)", file=sys.stderr)
                return 2
            # the CLI can't know the partition value's WRITTEN type: an
            # all-digit value may tag a string-typed partition ('2024'),
            # and part matching is typed (_json_safe equality). Try the
            # int typing first, fall back to the string typing before
            # refusing (ADVICE r7).
            candidates = (
                [int(raw), raw] if raw.lstrip("-").isdigit() else [raw]
            )
            last: Exception | None = None
            for cand in candidates:
                try:
                    v = M.compact(
                        spark, args.path, target_files=args.target_files,
                        part_eq={k: cand},
                    )
                    break
                except ValueError as e:
                    if "no partition-tagged segments match" not in str(e):
                        raise
                    last = e
            else:
                raise last  # both typings refused: the partition isn't there
        else:
            v = M.compact(spark, args.path, target_files=args.target_files)
        print(json.dumps({"committed_version": v}))
        return 0
    if args.action == "vacuum":
        older_than = None
        if args.retain_hours is not None:
            import time as _time

            older_than = _time.time() - args.retain_hours * 3600.0
        n = M.vacuum(
            spark, args.path, keep_versions=args.keep_versions,
            older_than_ts=older_than, dry_run=args.dry_run,
            pins=args.pins.split(",") if args.pins else None,
            include_registered_pins=not args.no_pins,
        )
        key = "segments_reclaimable" if args.dry_run else "segments_deleted"
        print(json.dumps({key: n}))
        return 0
    if args.action == "describe":
        row = M.describe_detail(spark, args.path).collect()[0]
        print(json.dumps(row.asDict()))
        return 0
    if args.action == "advise":
        plan = M.plan_maintenance(spark, args.path)
        if args.apply:
            done = M.apply_maintenance(spark, args.path, plan)
            print(json.dumps(done))
        else:
            print(json.dumps(plan))
        return 0
    if args.action == "restore":
        if args.version is None:
            print("restore requires --version", file=sys.stderr)
            return 2
        v = M.restore(spark, args.path, version=args.version)
        print(json.dumps({"committed_version": v}))
        return 0
    if args.action == "clone":
        if not args.dest:
            print("clone requires --dest", file=sys.stderr)
            return 2
        v = M.clone(spark, args.path, args.dest, deep=args.deep)
        print(json.dumps({"clone_version": v, "dest": args.dest}))
        return 0
    if args.action == "constraint":
        if args.drop:
            v = M.drop_constraint(spark, args.path, args.drop)
        elif args.rule:
            name, expr = args.rule.split(":", 1)
            v = M.set_constraint(spark, args.path, name, expr)
        else:
            print(json.dumps(M.table_constraints(spark, args.path)))
            return 0
        print(json.dumps({"committed_version": v}))
        return 0
    if args.action == "rename-column":
        if not (args.old and args.new):
            print("rename-column requires --old and --new", file=sys.stderr)
            return 2
        v = M.rename_column(spark, args.path, args.old, args.new)
        print(json.dumps({"committed_version": v}))
        return 0
    if args.action == "drop-column":
        if not args.old:
            print("drop-column requires --old", file=sys.stderr)
            return 2
        v = M.drop_column(spark, args.path, args.old)
        print(json.dumps({"committed_version": v}))
        return 0
    if args.action == "feed":
        if not (args.keys and args.state and args.dest):
            print("feed requires --keys, --state and --dest", file=sys.stderr)
            return 2
        n = M.consume_feed(
            spark,
            args.path,
            args.keys.split(","),
            args.state,
            M.feed_to_lake_sink(spark, args.dest),
            max_versions=args.max_versions,
        )
        print(json.dumps({"versions_processed": n}))
        return 0
    if args.action == "backfill":
        if not (args.state and args.dest):
            print("backfill requires --state and --dest", file=sys.stderr)
            return 2

        chunks = {"n": 0}

        def _land(df, idx, n_chunks):
            M.commit_append(spark, args.dest, df, tag=f"backfill={idx}")
            chunks["n"] = n_chunks

        v = M.backfill_snapshot_chunks(
            spark, args.path, _land, args.state,
            chunk_segments=args.chunk_segments,
        )
        print(json.dumps({
            "pinned_version": v,
            "n_chunks": chunks["n"],
            "starting_version": v + 1,  # hand the stream off here
        }))
        return 0
    if args.action == "compact-small":
        if args.target_rows is None:
            print("compact-small requires --target-rows", file=sys.stderr)
            return 2
        v = M.compact_small(
            spark, args.path, target_rows=args.target_rows,
            target_files=args.target_files,
        )
        print(json.dumps({"committed_version": v}))
        return 0
    if args.action == "expectation":
        if args.drop:
            v = M.drop_expectation(spark, args.path, args.drop)
        elif args.rule:
            name, expr = args.rule.split(":", 1)
            v = M.set_expectation(spark, args.path, name, expr)
        else:
            print(json.dumps(M.table_expectations(spark, args.path)))
            return 0
        print(json.dumps({"committed_version": v}))
        return 0
    if args.action == "wap-ingest":
        if not (args.input and args.keys):
            print("wap-ingest requires --input and --keys", file=sys.stderr)
            return 2
        batch = spark.read.parquet(args.input)
        v = M.wap_ingest(
            spark, args.path, batch,
            keys=args.keys.split(","), quarantine=args.dest,
        )
        print(json.dumps({"committed_version": v}))
        return 0
    if args.action == "widen-type":
        if not (args.old and args.new):
            print("widen-type requires --old COL --new TYPE", file=sys.stderr)
            return 2
        v = M.widen_column_type(spark, args.path, args.old, args.new)
        print(json.dumps({"committed_version": v}))
        return 0
    if args.action == "set-generated":
        if not args.rule or ":" not in args.rule:
            print("set-generated requires --rule col:sql_expr", file=sys.stderr)
            return 2
        col, expr = args.rule.split(":", 1)
        v = M.set_generated_column(spark, args.path, col, expr)
        print(json.dumps({"committed_version": v}))
        return 0
    if args.action == "pin-catalog":
        if not args.lakes:
            print(
                "pin-catalog requires --lakes name=path[,name=path...]",
                file=sys.stderr,
            )
            return 2
        lakes = dict(kv.split("=", 1) for kv in args.lakes.split(","))
        v = M.pin_catalog(spark, args.path, lakes, tag=args.tag)
        print(json.dumps({
            "catalog_version": v,
            "pins": {
                n: pv for n, (_, pv) in M.catalog_entries(
                    spark, args.path
                ).items()
            },
        }))
        return 0
    if args.action == "set-unique":
        if not args.by:
            print("set-unique requires --by col[,col...]", file=sys.stderr)
            return 2
        v = M.set_unique_key(spark, args.path, args.by.split(","))
        print(json.dumps({"committed_version": v}))
        return 0
    if args.action == "join-mv":
        need = (args.dim, args.keys, args.fk, args.dim_key, args.group,
                args.sums, args.mv, args.state)
        if not all(need):
            print(
                "join-mv requires --dim --keys(fact) --fk --dim-key "
                "--group --sums --mv --state (and --dim-keys, default "
                "= --dim-key)",
                file=sys.stderr,
            )
            return 2
        from .operators.matview import maintain_join_matview

        changed = maintain_join_matview(
            spark, args.path, args.dim,
            args.keys.split(","),
            (args.dim_keys or args.dim_key).split(","),
            args.fk, args.dim_key, args.group, args.sums.split(","),
            args.mv, args.state,
        )
        print(json.dumps({
            "changed": changed,
            "mv_version": M.current_version(spark, args.mv),
        }))
        return 0
    if args.action == "branch":
        if not args.name:
            print("branch requires --name", file=sys.stderr)
            return 2
        b = M.create_branch(spark, args.path, args.name, version=args.version)
        print(json.dumps({"branch": args.name, "root": b}))
        return 0
    if args.action == "publish":
        if not args.name:
            print("publish requires --name", file=sys.stderr)
            return 2
        v = M.publish_branch(
            spark, args.path, args.name, keep_branch=args.keep_branch
        )
        print(json.dumps({"committed_version": v}))
        return 0
    if args.action == "branches":
        print(json.dumps(M.list_branches(spark, args.path)))
        return 0
    if args.action == "drop-branch":
        if not args.name:
            print("drop-branch requires --name", file=sys.stderr)
            return 2
        M.drop_branch(spark, args.path, args.name)
        print(json.dumps({"dropped": args.name}))
        return 0
    if args.action == "stats":
        cols = args.stats_cols.split(",") if args.stats_cols else []
        kw = dict(
            min_cols=cols, max_cols=cols, count_cols=cols,
            allow_scan=not args.metadata_only,
        )
        if args.group_by:
            out = M.metadata_agg_by_partition(
                spark, args.path, args.group_by, **kw
            )
        else:
            out = M.metadata_agg(spark, args.path, **kw)
        print(json.dumps([r.asDict() for r in out.collect()], default=str))
        return 0
    if args.action == "zorder":
        if args.incremental:
            v = M.cluster_incremental(spark, args.path)
            print(json.dumps({"committed_version": v}))
            return 0
        if not args.by:
            print("zorder requires --by col[,col...]", file=sys.stderr)
            return 2
        cols = args.by.split(",")
        if args.partition:
            v = M.cluster_partitioned(spark, args.path, args.partition, cols)
        else:
            v = M.cluster(spark, args.path, cols, allow_untag=args.allow_untag)
        print(json.dumps({"committed_version": v}))
        return 0
    print(f"unknown lake action {args.action!r}", file=sys.stderr)
    return 2


def cmd_index(args) -> int:
    """ANN index maintenance over the index-as-table lakes: build or
    incrementally update the IVF-int8 index, or build the PQ codebook
    index — paired with the `lake` verbs (describe/history/vacuum work
    on index lakes like any other manifest lake)."""
    import json

    from .operators import similarity as SIM
    from .sources import manifest as M

    spark = _spark()
    if args.action == "delete":
        if not args.ids:
            print("delete requires --ids", file=sys.stderr)
            return 2
        ids = [int(x) for x in args.ids.split(",")]
        out = SIM.propagate_index_deletes(
            spark, ids, args.id, index_code_paths=[args.codes],
            emb_path=args.emb_lake, mode="mor" if args.mor else "cow",
        )
        print(json.dumps({"committed": out}))
        return 0
    if not args.emb or not args.centroids:
        print("this action requires --emb and --centroids", file=sys.stderr)
        return 2
    emb = spark.read.parquet(args.emb)
    if args.action == "build":
        SIM.build_ivf_quantized_index(
            spark, emb, args.id, args.vec, args.cells,
            args.centroids, args.codes,
        )
    elif args.action == "update":
        SIM.update_ivf_quantized_index(
            spark, emb, args.id, args.vec, args.centroids, args.codes
        )
    elif args.action == "build-pq":
        SIM.build_pq_index(
            spark, emb, args.id, args.vec, args.m, args.ksub,
            args.centroids, args.codes,
        )
    else:
        print(f"unknown index action {args.action!r}", file=sys.stderr)
        return 2
    print(
        json.dumps(
            {
                "codes_version": M.current_version(spark, args.codes),
                "n_segments": len(M.resolve_segments(spark, args.codes)),
            }
        )
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="nba_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    q = sub.add_parser("query")
    q.add_argument("name")
    q.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    q.add_argument("-n", type=int, default=20)
    pl = sub.add_parser("pipeline")
    pl.add_argument("dataset", help="games|playbyplay|boxscores|coaches|salary|players|all")
    pl.add_argument("--out", required=True)
    pub = sub.add_parser("publish")
    pub.add_argument("input", help="parquet path to publish")
    pub.add_argument("--lake", required=True)
    pub.add_argument("--quarantine", required=True)
    pub.add_argument(
        "--rule",
        action="append",
        default=[],
        help="name:sql_expr expectation (repeatable); default: NOT NULL on every column",
    )
    pub.add_argument(
        "--manifest",
        action="store_true",
        help="commit pass rows to a manifest lake (atomic, time-travelable)",
    )
    pub.add_argument(
        "--strict", action="store_true", help="exit 3 when any row quarantines"
    )
    lk = sub.add_parser("lake")
    lk.add_argument(
        "action",
        help="history|compact|vacuum|describe|advise|restore|clone|"
        "constraint|zorder|backfill|feed|rename-column|drop-column|branch|"
        "publish|branches|drop-branch|stats|compact-small|widen-type|"
        "set-generated|expectation|wap-ingest|set-unique|join-mv|pin-catalog",
    )
    lk.add_argument("path", help="manifest lake root")
    lk.add_argument("--target-files", type=int, default=1)
    lk.add_argument("--keep-versions", type=int, default=2)
    lk.add_argument("--dry-run", action="store_true", help="vacuum: audit only")
    lk.add_argument(
        "--apply", action="store_true",
        help="advise: execute the ranked plan instead of printing it",
    )
    lk.add_argument("--version", type=int, default=None, help="restore target")
    lk.add_argument("--dest", default=None, help="clone destination")
    lk.add_argument("--deep", action="store_true", help="clone: copy segments")
    lk.add_argument("--rule", default=None, help="constraint: name:sql_expr to add")
    lk.add_argument("--drop", default=None, help="constraint: name to drop")
    lk.add_argument("--by", default=None, help="zorder: comma-separated columns")
    lk.add_argument("--partition", default=None, help="zorder: within-partition col")
    lk.add_argument("--allow-untag", action="store_true", help="zorder: untag trade")
    lk.add_argument(
        "--incremental", action="store_true",
        help="zorder: fold post-cluster appends into the existing layout",
    )
    lk.add_argument(
        "--retain-hours", type=float, default=None,
        help="vacuum: also keep every version committed in the last N hours",
    )
    lk.add_argument(
        "--part", default=None,
        help="compact: col=value scope (OPTIMIZE WHERE — only matching "
        "partition-tagged segments consolidate)",
    )
    lk.add_argument("--old", default=None, help="rename/drop-column: column name")
    lk.add_argument("--new", default=None, help="rename-column: new name")
    lk.add_argument("--keys", default=None, help="feed: comma-separated key cols")
    lk.add_argument("--state", default=None, help="feed: checkpoint dir")
    lk.add_argument(
        "--max-versions", type=int, default=None,
        help="feed: process at most N versions this run",
    )
    lk.add_argument(
        "--chunk-segments", type=int, default=8,
        help="backfill: max segments per bounded chunk",
    )
    lk.add_argument("--name", default=None, help="branch/publish: branch name")
    lk.add_argument(
        "--target-rows", type=int, default=None,
        help="compact-small: consolidate segments under this row count",
    )
    lk.add_argument(
        "--input", default=None,
        help="wap-ingest: parquet path of the batch to audit-ingest",
    )
    lk.add_argument(
        "--keep-branch", action="store_true",
        help="publish: leave the branch in place after fast-forward",
    )
    lk.add_argument(
        "--stats-cols", default=None,
        help="stats: comma-separated columns for min/max/count",
    )
    lk.add_argument(
        "--group-by", default=None,
        help="stats: partition column for a per-partition report",
    )
    lk.add_argument(
        "--metadata-only", action="store_true",
        help="stats: refuse to open data files (prove the manifest answers)",
    )
    lk.add_argument("--dim", default=None, help="join-mv: dim lake root")
    lk.add_argument("--fk", default=None, help="join-mv: fact FK column")
    lk.add_argument("--dim-key", default=None, help="join-mv: dim join column")
    lk.add_argument(
        "--dim-keys", default=None,
        help="join-mv: dim row-identity cols (default: --dim-key)",
    )
    lk.add_argument("--group", default=None, help="join-mv: dim group column")
    lk.add_argument("--sums", default=None, help="join-mv: fact sum columns")
    lk.add_argument("--mv", default=None, help="join-mv: view lake root")
    lk.add_argument(
        "--lakes", default=None,
        help="pin-catalog: name=path[,name=path...] lakes to pin",
    )
    lk.add_argument("--tag", default=None, help="pin-catalog: idempotency tag")
    lk.add_argument(
        "--pins", default=None,
        help="vacuum: comma-separated catalog lakes whose pins must survive "
        "(registered catalogs are honored automatically)",
    )
    lk.add_argument(
        "--no-pins", action="store_true",
        help="vacuum: ignore catalogs registered on the lake and reclaim "
        "their pinned versions deliberately",
    )
    ix = sub.add_parser("index")
    ix.add_argument("action", help="build|update|build-pq|delete")
    ix.add_argument("--emb", default=None, help="embeddings parquet path")
    ix.add_argument("--id", default="vec_id")
    ix.add_argument("--vec", default="embedding")
    ix.add_argument("--cells", type=int, default=8, help="IVF cell count")
    ix.add_argument("--m", type=int, default=8, help="PQ subspaces")
    ix.add_argument("--ksub", type=int, default=32, help="PQ codewords/subspace")
    ix.add_argument("--centroids", default=None, help="centroids/codebooks lake")
    ix.add_argument("--codes", required=True, help="codes lake")
    ix.add_argument("--ids", default=None, help="delete: comma-separated ids")
    ix.add_argument("--emb-lake", default=None, help="delete: embeddings LAKE root")
    ix.add_argument("--mor", action="store_true", help="delete: tombstone mode")
    args = p.parse_args(argv)
    return {
        "list": cmd_list,
        "query": cmd_query,
        "pipeline": cmd_pipeline,
        "publish": cmd_publish,
        "lake": cmd_lake,
        "index": cmd_index,
    }[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
