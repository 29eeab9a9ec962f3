"""Stage an adversarial testdata dir at /tmp/adversarial_sf.

Documents with NULL/empty/sub-shingle texts and events with junk JSON —
the data shapes the synthetic testdata never produces but real corpora
do. Run the full gate against it:

    python tools/make_adversarial.py
    python tools/local_verify.py /tmp/adversarial_sf

Found in round 1: ANSI divide-by-zero in jaccard, NULL-text crashes in
mapInPandas, concat_ws('')-vs-NULL fingerprint divergence, DuckDB
TRY_CAST('3.5' AS INT)=4 vs Spark NULL, NULL-token shingle arrays
crashing MLlib MinHashLSH.
"""

from __future__ import annotations

import os
import shutil

import duckdb

BASE = "/root/testdata/sf0.001"
DEST = "/tmp/adversarial_sf"

DOCS = [
    (0, None, "en", "s0", 0),
    (1, "", "en", "s0", 0),
    (2, "one", "en", "s0", 3),
    (3, "two words", "en", "s0", 9),
    (4, "tiny doc", "en", "s0", 8),
    (5, "the quick brown fox jumps over the lazy dog near the old mill house today", "en", "s1", 74),
    (6, "the quick brown fox jumps over the lazy dog near the old mill house today", "en", "s1", 74),
]

# Boilerplate storm: 1200 byte-identical docs (one LSH bucket holding
# 1200 ids — ABOVE both hot-bucket caps: minhash 1000, simhash 600) +
# 20 near-identical variants that stay under the caps. Exercises the
# cap's drop path AND its oracle replay (both engines must drop the
# same buckets), the all-dropped/empty-result edge, tier-1 collapse of
# a 1200-dup group, and the blocked quadratic tiers on a 1200-doc
# metadata block.
_BOILER = (
    "subscribe to our newsletter for the latest updates and offers "
    "terms of service privacy policy all rights reserved contact us"
)
DOCS += [(100 + i, _BOILER, "en", "s2", len(_BOILER)) for i in range(1200)]
DOCS += [
    (2000 + i, _BOILER.replace("offers", f"offers v{i}"), "en", "s2",
     len(_BOILER) + 3)
    for i in range(20)
]

EVENTS = [
    (0, "2024-01-01 00:00:01", 1, "click", 10.5, '{"k": 87}'),
    (1, "2024-01-01 00:00:02", 1, "purchase", 20.0, '{"k": "7"}'),
    (2, "2024-01-01 00:00:03", 1, "error", 1.0, '{"k": "abc"}'),
    (3, "2024-01-01 00:00:04", 2, "view", 5.0, "not json at all"),
    (4, "2024-01-01 00:00:05", 2, "signup", 7.25, '{"k": 3.5}'),
    # NULL key / value / props / timestamp shapes
    (5, "2024-01-01 00:00:06", None, "click", 2.0, None),
    (6, "2024-01-01 00:00:07", 2, "purchase", None, '{"k": 1}'),
    (7, None, 1, "view", 3.0, '{"k": 2}'),
]


CUSTOMERS = [
    (1, "alpha", 0, 100.5, "BUILDING"),
    (2, "beta", 1, None, "MACHINERY"),      # NULL acctbal
    (3, "gamma", None, 50.0, None),          # NULL nationkey + segment
    (4, "delta", 2, -10.0, "FURNITURE"),
]

ORDERS = [
    (10, 1, "F", 1000.0, "1997-03-01", "1-URGENT"),
    (11, 2, "O", None, "1997-06-15", "2-HIGH"),      # NULL totalprice
    (12, None, "P", 500.0, None, None),               # NULL custkey + date
    (13, 1, None, 750.0, "1998-01-05", "3-MEDIUM"),  # NULL status
]

LINEITEM = [
    (10, 1, 1, 1, 5.0, 100.25, 0.05, 0.02, "A", "F", "1997-03-05"),
    (10, 2, 1, 2, None, 200.50, 0.10, 0.10, "N", "O", "1997-03-06"),   # NULL qty
    (11, 3, 2, 1, 3.0, None, None, 0.03, None, "F", None),             # NULL price/disc/flag/ship
    (12, 4, 2, 1, 30.0, 50.75, 0.00, None, "R", None, "1997-07-01"),   # NULL tax/status
]


def main() -> None:
    shutil.rmtree(DEST, ignore_errors=True)
    os.makedirs(DEST)
    for t in ["region", "nation", "supplier", "part"]:
        os.symlink(f"{BASE}/{t}.parquet", f"{DEST}/{t}.parquet")
    con = duckdb.connect()
    # Embedding boilerplate storm: base vectors + 1200 byte-identical
    # embeddings (one SemDeDup cell / one sign-LSH bucket holding 1200
    # ids — ABOVE the semdedup hot-cell cap of 1000). Labels spread
    # 0..9 so the label-BLOCKED tier isn't quadratic-swamped; the
    # degenerate mass hits exactly the cell/bucket tiers, exercising
    # the cap's drop path and its oracle replay on both engines.
    con.execute(
        f"""
        CREATE TABLE emb AS
        SELECT * FROM '{BASE}/embeddings.parquet'
        UNION ALL
        SELECT 10000 + i AS vec_id,
               CAST([0.5 FOR _ IN RANGE(64)] AS FLOAT[]) AS embedding,
               CAST(i % 10 AS INTEGER) AS label
        FROM RANGE(1200) t(i)
        """
    )
    con.execute(f"COPY emb TO '{DEST}/embeddings.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE c (c_custkey BIGINT, c_name VARCHAR, c_nationkey INTEGER, "
        "c_acctbal DOUBLE, c_mktsegment VARCHAR)"
    )
    con.executemany("INSERT INTO c VALUES (?,?,?,?,?)", CUSTOMERS)
    con.execute(f"COPY c TO '{DEST}/customer.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE o (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority VARCHAR)"
    )
    con.executemany("INSERT INTO o VALUES (?,?,?,?,?,?)", ORDERS)
    con.execute(f"COPY o TO '{DEST}/orders.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE li (l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
        "l_tax DOUBLE, l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP)"
    )
    con.executemany("INSERT INTO li VALUES (?,?,?,?,?,?,?,?,?,?,?)", LINEITEM)
    con.execute(f"COPY li TO '{DEST}/lineitem.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", DOCS)
    con.execute(f"COPY d TO '{DEST}/documents.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?,?,?,?,?,?)", EVENTS)
    con.execute(f"COPY e TO '{DEST}/events.parquet' (FORMAT PARQUET)")
    print(f"staged {DEST}")


if __name__ == "__main__":
    main()
