"""Generate a scaled replica dataset for the overflow scale gates —
run `python tools/make_sf1.py [dest] [--factor N] [--money-only]`,
then `python tools/selfcheck.py <dest> <entries...>`.

Replicates every fact-ish table ``factor``x (default 10 = sf1 from
sf0.1) with coherent key shifts (+1e9 per copy on every key column
that participates in a join), so referential joins keep working and
every aggregate's sums grow ``factor``x. The default 10x is two scale
steps above the driver's sf0.01 oracle gate, which is what flushes
out value-boundary bugs like decimal→double conversions whose
unscaled values pass 2^53 (the r11 pricing_summary find);
``--factor 100`` (sf10) pushes the scale-4 DECIMAL money sums
themselves past 2^53 (the r12 money-contract gate). Dimensions
(region, nation) stay single-copy. ``--money-only`` keeps the
non-money tables (events, documents, embeddings) single-copy so an
sf10 money gate doesn't pay for 100x text/embedding replicas the
money entries never read — the tables still exist, so the selfcheck
harness's view registration binds. The output is DISPOSABLE gate
input, not driver testdata — the driver contract stays on
/root/testdata.
"""

import sys
import time

import duckdb

SHIFT = 1_000_000_000
SRC = "/root/testdata/sf0.1"

#: fact table -> key columns that shift per replica copy
FACT_KEYS = {
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey"},
    "events": {"event_id"},  # user_id kept: factor-x events per user
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}
MONEY_TABLES = ("customer", "supplier", "part", "orders", "lineitem")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    money_only = "--money-only" in args
    if money_only:
        args.remove("--money-only")
    factor = 10
    if "--factor" in args:
        i = args.index("--factor")
        factor = int(args[i + 1])
        del args[i : i + 2]
    dest = args[0] if args else "/tmp/sf1"
    import os

    os.makedirs(dest, exist_ok=True)
    t0 = time.time()
    con = duckdb.connect()

    def copy1(table: str) -> None:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{table}.parquet') "
            f"TO '{dest}/{table}.parquet' (FORMAT PARQUET)"
        )

    for dim in ("region", "nation"):
        copy1(dim)

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
            f"CROSS JOIN range(0, {factor}) i) "
            f"TO '{dest}/{table}.parquet' (FORMAT PARQUET)"
        )

    for table, keys in FACT_KEYS.items():
        if money_only and table not in MONEY_TABLES:
            copy1(table)
        else:
            rep(table, keys)
    print(
        f"sf{factor / 10:g} written to {dest} "
        f"({'money tables only' if money_only else 'all facts'}) "
        f"in {time.time() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
