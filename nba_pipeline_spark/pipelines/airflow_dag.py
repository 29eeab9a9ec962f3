"""Thin Airflow DAG artifact over the spark-submit seam (VERDICT r7
next #9) — the literal scheduler wrapper the reference ships
(data_ingestion/dags/scrape_data_to_gcs.py:199-340: three @once
dataset DAGs, a @yearly catchup games DAG over 1997-2023 with
max_active_runs=3, and playbyplay/boxscores DAGs consuming the games
output of the same execution date; gcs_to_bq_dag.py:6 imports the
warehouse-load operators downstream).

Division of labor (documented runner parity):

- task-level semantics — dependency order, per-task retries,
  downstream skip, season backfill isolation — live in
  ``pipelines/runner.py`` and execute INSIDE one Spark job per DAG
  run (``pipelines/submit.py``). The reference ran one Airflow worker
  subprocess per pandas task and passed data through local CSV files
  (scrape_data_to_gcs.py:194-196); here the intra-run graph is the
  engine's, so a season's chain is one spark-submit with the cluster
  parallelism left to Spark.
- schedule-level semantics — @once vs @yearly catchup, cross-DAG
  dates, operational retry of a whole run — stay with the scheduler,
  which needs nothing from us but a command line. That is this file.

The module PARSES WITHOUT AIRFLOW (the engine never imports it;
pytest imports it parse-only): the task graph is declared as pure
data in ``DAG_SPECS``, command lines render via ``render_command``,
and ``build_dags()`` materializes real ``airflow.DAG`` objects only
when the scheduler's own environment provides the package. Drop this
file in a dags/ folder unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

SPARK_SUBMIT = "spark-submit"
MODULE = "nba_pipeline_spark.pipelines.submit"

# reference season range: scrape_data_to_gcs.py:271-275
# (start_date 1997, end_date 2023, catchup=True)
FIRST_SEASON, LAST_SEASON = 1996, 2022


@dataclass(frozen=True)
class DagSpec:
    dag_id: str
    schedule: str | None  # None = @once (reference schedule_interval="@once")
    tasks: tuple[tuple[str, tuple[str, ...]], ...]  # (task_id, upstream ids)
    args: tuple[str, ...] = ()  # extra submit.py argv (templated)
    max_active_runs: int = 1
    catchup: bool = False
    doc: str = ""
    params: dict = field(default_factory=dict)


DAG_SPECS: tuple[DagSpec, ...] = (
    DagSpec(
        dag_id="nba_once_dimensions",
        schedule=None,
        # one spark-submit covers the three @once reference DAGs
        # (player-info, salary, coaches: scrape >> parquetize >>
        # upload >> rm becomes ingest -> build -> partitioned write
        # inside the job; no local staging hop, so no rm task)
        tasks=(("submit_once", ()),),
        args=("--seasons", "", "--retries", "1"),
        doc="player-info + salary + coaches, season-independent",
    ),
    DagSpec(
        dag_id="nba_seasonal_facts",
        schedule="@yearly",
        # games -> playbyplay/boxscores dependency is enforced by the
        # runner INSIDE the job (pipelines/submit.py::season_dag), so
        # the scheduler sees one task per execution date instead of
        # the reference's broken cross-DAG file hand-off
        # (scrape_data_to_gcs.py:309 src_dir template)
        tasks=(("submit_season", ()),),
        args=("--skip-once", "--seasons", "{{ data_interval_start.year }}"),
        max_active_runs=3,  # reference: scrape_data_to_gcs.py:274
        catchup=True,
        doc="games + playbyplay + boxscores for the execution season",
        params={"first_season": FIRST_SEASON, "last_season": LAST_SEASON},
    ),
)


def render_command(spec: DagSpec, out_dir: str = "{{ var.value.nba_lake }}") -> str:
    """The BashOperator command line for a spec — spark-submit through
    the pipelines.submit seam; master/conf come from the deployment's
    spark-submit defaults, schedule template fields from Airflow."""
    argv = [SPARK_SUBMIT, "-m", MODULE, "--out-dir", out_dir, *spec.args]
    return " ".join(a for a in argv if a != "")


def airflow_available() -> bool:
    try:
        import airflow  # noqa: F401

        return True
    except ImportError:
        return False


def build_dags(out_dir: str = "{{ var.value.nba_lake }}") -> dict:
    """dag_id -> airflow.DAG, one per spec — empty dict (not an
    ImportError) in engine/test environments without the scheduler
    package. Parse-only by construction: every operator is a
    BashOperator over `render_command`, no callables cross the
    scheduler boundary."""
    if not airflow_available():
        return {}
    from datetime import datetime

    from airflow import DAG
    from airflow.operators.bash import BashOperator

    dags = {}
    for spec in DAG_SPECS:
        dag = DAG(
            dag_id=spec.dag_id,
            schedule=spec.schedule,
            start_date=datetime(FIRST_SEASON + 1, 1, 1),
            end_date=datetime(LAST_SEASON + 1, 12, 31) if spec.catchup else None,
            catchup=spec.catchup,
            max_active_runs=spec.max_active_runs,
            doc_md=spec.doc,
            params=dict(spec.params),
        )
        ops = {}
        for task_id, deps in spec.tasks:
            ops[task_id] = BashOperator(
                task_id=task_id,
                bash_command=render_command(spec, out_dir),
                retries=1,  # reference default_args retry stance
                dag=dag,
            )
        for task_id, deps in spec.tasks:
            for d in deps:
                ops[d] >> ops[task_id]  # noqa: B015 — airflow DSL
        dags[spec.dag_id] = dag
    return dags


# Airflow's DagBag discovers module-level DAG objects; a no-scheduler
# environment leaves the namespace clean.
globals().update(build_dags())
