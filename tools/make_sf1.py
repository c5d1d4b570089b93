"""Generate an sf1-scale dataset (10x sf0.1) for the overflow scale
gate (VERDICT r10 item 7) — run `python tools/make_sf1.py [dest]`,
then `python tools/selfcheck.py <dest> <entries...>`.

Replicates every fact-ish table 10x with coherent key shifts
(+1e9 per copy on every key column that participates in a join), so
referential joins keep working and every aggregate's sums grow 10x —
two scale steps above the driver's sf0.01 oracle gate, which is what
flushes out value-boundary bugs like decimal→double conversions whose
unscaled values pass 2^53 (the r11 pricing_summary find). Dimensions
(region, nation) stay single-copy. The output is DISPOSABLE gate
input, not driver testdata — the driver contract stays on
/root/testdata.
"""

import sys
import time

import duckdb

SHIFT = 1_000_000_000
SRC = "/root/testdata/sf0.1"


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    import os

    os.makedirs(dest, exist_ok=True)
    t0 = time.time()
    con = duckdb.connect()
    for dim in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{dim}.parquet') "
            f"TO '{dest}/{dim}.parquet' (FORMAT PARQUET)"
        )

    def rep(table: str, keycols: set) -> None:
        cols = [
            c[0]
            for c in con.execute(
                "SELECT column_name FROM "
                f"(DESCRIBE SELECT * FROM '{SRC}/{table}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            (f"{c} + i.range * {SHIFT} AS {c}" if c in keycols else c)
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{table}.parquet' "
            "CROSS JOIN range(0, 10) i) "
            f"TO '{dest}/{table}.parquet' (FORMAT PARQUET)"
        )

    rep("customer", {"c_custkey"})
    rep("supplier", {"s_suppkey"})
    rep("part", {"p_partkey"})
    rep("orders", {"o_orderkey", "o_custkey"})
    rep("lineitem", {"l_orderkey", "l_partkey", "l_suppkey"})
    rep("events", {"event_id"})  # user_id kept: 10x events per user
    rep("documents", {"doc_id"})
    rep("embeddings", {"vec_id"})
    print(f"sf1 written to {dest} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
