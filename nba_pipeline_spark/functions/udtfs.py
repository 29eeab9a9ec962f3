"""Python UDTFs (Spark 4 user-defined TABLE functions) — the declared
UDTF escape surface SURVEY §2.12 reserves next to pandas_udf /
applyInPandas / mapInPandas.

Policy unchanged: every reference `.apply` compiles to builtin Column
expressions; UDTFs exist for genuinely TABLE-valued Python logic (one
input row → many output rows with Python-side state per row) where
the builtin `explode(sequence(...))` form would be contorted. The
engine keeps them OUT of the hot path — q_udtf_chunks exists to pin
the surface (registration, lateral-join planning, arrow batching) and
to measure its cost against the builtin twin q_chunk_docs, which the
bench shows is the faster plan (PythonUDTF rows cross the
Python/Arrow boundary; explode+substring stays in whole-stage
codegen).

Reference analog: the row-wise `.apply(f, axis=1)` expansions
(playByplay.py:101, boxScores.py:34) — table-in, rows-out Python.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="doc_id bigint, chunk_id int, chunk_text string")
class ChunkTextUDTF:
    """Overlapping character windows (200 wide, stride 150) — the
    UDTF twin of q_chunk_docs' explode(sequence(...)) plan, byte-for-
    byte the same output (1-based substring positions, empty/NULL
    text yields no rows)."""

    def eval(self, doc_id, text):
        if text is None or len(text) == 0:
            return
        for k, pos in enumerate(range(0, len(text), 150)):
            yield doc_id, k + 1, text[pos:pos + 200]


def register_udtfs(spark) -> None:
    """Idempotent SQL registration of the UDTF surface."""
    spark.udtf.register("chunk_text_udtf", ChunkTextUDTF)
