"""sf1 scale probe: empirical 10x-data scaling check for the
heavyweight operators whose 100 TB claims otherwise rest on plan
reading alone.

Generates a 10x replica of the sf0.1 testdata under
``.scale_probe/sf1`` (never touches /root/testdata):

- ``documents``: 10 disjoint copies; copy k > 0 suffixes every token
  with ``xk``, which keeps the token-frequency/length distribution of
  the original corpus while making shingle space DISJOINT across
  copies — per-bucket density stays sf0.1-like and bucket count grows
  10x, i.e. the "more distinct documents from the same distribution"
  shape a real scale-up has. (Plain duplication would instead make
  every doc 9 mutual near-dups and quadratically explode pair counts
  by construction, measuring the data, not the algorithm.)
- ``lineitem``/``orders``: 10 disjoint copies with order/part keys
  offset per copy — 10 disjoint co-purchase graphs (more parts, more
  orders), not one graph with 10x edge multiplicity.

Then times each probe query once warm (one untimed pass at EACH
scale first to absorb codegen/JIT/file-listing/page-cache, matching
bench.py's second-pass convention) at sf0.1 and sf1 and prints one
JSON line with the
sec-per-sf ratio: ratio10 = t(sf1) / (10 * t(sf0.1)). ratio10 ~ 1.0
is linear scaling; >> 1 is the super-linear finding the local bench
cannot see. Fixed overhead (job scheduling, 15 pagerank rounds of
job launch) makes small-side times look worse, so ratios BELOW 1 are
expected for overhead-dominated queries.

Usage: python tools/scale_probe.py [--regen]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_probe",
    "sf1",
)
COPIES = 10
KEY_OFFSET = 100_000_000


def _replicate_embeddings(dst: str, src: str, copies: int = COPIES) -> None:
    """10x embeddings with vec_id offset per copy — ONE definition for
    generate() and main()'s backfill so the two paths cannot drift."""
    import pandas as pd
    import pyarrow.parquet as pq

    emb = pq.read_table(os.path.join(src, "embeddings.parquet")).to_pandas()
    frames = []
    for k in range(copies):
        c = emb.copy()
        c["vec_id"] = c["vec_id"] + k * KEY_OFFSET
        frames.append(c)
    pd.concat(frames, ignore_index=True).to_parquet(
        os.path.join(dst, "embeddings.parquet"), index=False
    )


def generate(dst: str = DST, src: str = SRC, copies: int = COPIES) -> None:
    import pandas as pd
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)

    docs = pq.read_table(os.path.join(src, "documents.parquet")).to_pandas()
    frames = []
    for k in range(copies):
        c = docs.copy()
        c["doc_id"] = c["doc_id"] + k * KEY_OFFSET
        if k:
            suf = f"x{k}"
            # preserve NULL text as NULL — rewriting it to "" would
            # give copies 1..9 a different NULL/empty row mix than the
            # source distribution the probe claims to replicate
            c["text"] = c["text"].map(
                lambda s, suf=suf: None
                if s is None
                else " ".join(w + suf for w in s.split())
            )
            # nullable Int64 keeps NULL-text rows NULL without
            # upcasting the whole column to float64 on concat
            c["n_chars"] = c["text"].str.len().astype("Int64")
        frames.append(c)
    pd.concat(frames, ignore_index=True).to_parquet(
        os.path.join(dst, "documents.parquet"), index=False
    )

    li = pq.read_table(os.path.join(src, "lineitem.parquet")).to_pandas()
    frames = []
    for k in range(copies):
        c = li.copy()
        c["l_orderkey"] = c["l_orderkey"] + k * KEY_OFFSET
        c["l_partkey"] = c["l_partkey"] + k * KEY_OFFSET
        frames.append(c)
    pd.concat(frames, ignore_index=True).to_parquet(
        os.path.join(dst, "lineitem.parquet"), index=False
    )

    orders = pq.read_table(os.path.join(src, "orders.parquet")).to_pandas()
    frames = []
    for k in range(copies):
        c = orders.copy()
        c["o_orderkey"] = c["o_orderkey"] + k * KEY_OFFSET
        frames.append(c)
    pd.concat(frames, ignore_index=True).to_parquet(
        os.path.join(dst, "orders.parquet"), index=False
    )

    _replicate_embeddings(dst, src, copies)

    # dimension tables ride along VERBATIM (o_custkey is not offset,
    # so the 10x orders join the same customers — the "facts grew 10x,
    # dims didn't" shape a real scale-up has, and what the r9 probe
    # queries kpis/geo_rollup/apply_refunds_orders need)
    for dim in ("customer", "nation", "region"):
        shutil.copyfile(
            os.path.join(src, f"{dim}.parquet"),
            os.path.join(dst, f"{dim}.parquet"),
        )


def _replicate_events(dst: str, src: str, copies: int = COPIES) -> None:
    """10x events for the streaming-digest probes: event_id offset per
    copy, ts shifted a full span+day per copy so the copies are
    DISJOINT TIME ERAS of the same per-user event distribution (more
    history per user, same arrival shape) — plain duplication would
    instead create ``copies`` exact-duplicate instants per user and
    measure tie handling, not throughput. user_id kept: 10x events
    per user, which is exactly the per-user-state stress the stateful
    streams claim to bound."""
    import pandas as pd
    import pyarrow.parquet as pq

    ev = pq.read_table(os.path.join(src, "events.parquet")).to_pandas()
    span = (ev["ts"].max() - ev["ts"].min()) + pd.Timedelta(days=1)
    frames = []
    for k in range(copies):
        c = ev.copy()
        c["event_id"] = c["event_id"] + k * KEY_OFFSET
        c["ts"] = c["ts"] + k * span
        frames.append(c)
    pd.concat(frames, ignore_index=True).to_parquet(
        os.path.join(dst, "events.parquet"), index=False
    )


def _entry_probe(name: str):
    """Probe a driver entry by name (for the composed harness entries
    — e.g. the streaming replay digests — whose logic lives in
    __spark_entry__, not in an operator module)."""

    def fn(s, d):
        import __spark_entry__ as entrymod

        return entrymod.queries()[name](s, d)

    return fn


def probes():
    from pyspark.sql import functions as F

    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.operators import (
        corpus,
        dedup,
        graph,
        similarity,
    )
    from py_etl_pipeline_woocommerce_spark.plans import analytics, woo_model

    def docs(s, d):
        return load_table(s, d, "documents")

    def embs(s, d):
        return load_table(s, d, "embeddings")

    def _bpe_token_count(s, d):
        from py_etl_pipeline_woocommerce_spark.operators import bpe

        return bpe.bpe_token_count(docs(s, d), n_merges=8)

    return {
        # r9b additions: the corpus-curation breadth wave's heavier
        # shapes — both novelty sides grow 10x (explode + one
        # broadcastable-ref join), the curriculum's counts-fold must
        # stay source-bounded, the BPE/zipf vocab aggregates grow with
        # the suffixed token space, and the outlier op's two-phase
        # rank must not regress to a corpus-wide sort
        "ngram_novelty": lambda s, d: corpus.ngram_novelty(
            docs(s, d).filter(F.col("source") != "src0"),
            docs(s, d).filter(F.col("source") == "src0"),
        ),
        "curriculum_order": lambda s, d: corpus.curriculum_order(docs(s, d)),
        "bpe_merge_candidates": lambda s, d: corpus.bpe_merge_candidates(
            docs(s, d)
        ),
        "zipf_fit": lambda s, d: corpus.zipf_fit(docs(s, d)),
        "embedding_outliers": lambda s, d: similarity.embedding_outliers(
            embs(s, d)
        ),
        # r9: the three shapes the r8 semantic moves changed —
        # orders-grain COUNT(*) kpis, orders-grain geo with the
        # LEFT-joined money aggregate, and fct_orders itself — none
        # existed when the r7 sf1 probe ran
        "kpis": lambda s, d: analytics.kpis(s, d),
        "geo_rollup": lambda s, d: analytics.geo_rollup(s, d),
        "apply_refunds_orders": lambda s, d: woo_model.fct_orders(s, d),
        "part_pagerank": lambda s, d: graph.part_pagerank(s, d),
        "dedup_audit_sampled": lambda s, d: dedup.dedup_audit(
            docs(s, d), sample_frac=0.2
        ),
        # r10: the EXACT pair-join auditors (VERDICT r9 #3) — the
        # prefix-filter candidate joins the bench flags as the
        # slowest sf0.1 queries. On this replica (disjoint shingle
        # space per copy, per-bucket density held at sf0.1) the
        # candidate count grows ~linearly; on a REAL corpus whose
        # shingle reuse grows with size these are the first operators
        # to go superlinear, hence the sampled/bounded default above
        # the size threshold (see dedup.exact_audit_bounded).
        "dedup_ngram_jaccard": lambda s, d: dedup.ngram_jaccard_pairs(
            docs(s, d)
        ),
        "dedup_audit_exact": lambda s, d: dedup.dedup_audit(docs(s, d)),
        # r10: BPE apply path — distinct-token segmentation must stay
        # vocabulary-bounded (the suffixed replica grows the vocab
        # 10x, the corpus join 10x; both linear)
        "bpe_token_count": lambda s, d: _bpe_token_count(s, d),
        "dedup_containment": lambda s, d: dedup.containment_pairs(
            docs(s, d)
        ),
        # growing query set (every 97th doc — 10x queries at sf1, so
        # the workload itself is ~quadratic-by-construction) AND the
        # serving shape (fixed query batch over the growing corpus)
        "hybrid_search": lambda s, d: corpus.hybrid_search(docs(s, d)),
        "hybrid_search_fixed_queries": lambda s, d: corpus.hybrid_search(
            docs(s, d), query_ids=list(range(0, 5000, 97))
        ),
        "dedup_clusters": lambda s, d: dedup.dedup_clusters(docs(s, d)),
        "corpus_prep_v2": lambda s, d: corpus.corpus_prep_v2(docs(s, d)),
        # r12 additions: the fit-then-serve ANN composition (sweep =
        # one corpus scan per candidate geometry + the serve join —
        # both linear in corpus size) and the stateful streaming
        # digests (full events history replayed through the REAL
        # applyInPandasWithState queries in 3 micro-batches; per-user
        # bounded state, so throughput must scale with events, not
        # with users' history length)
        "ann_serve_tuned": lambda s, d: similarity.ann_serve_tuned(
            embs(s, d)
        ),
        "sessionize_stream_digest": _entry_probe("sessionize_stream_digest"),
        "transitions_stream_digest": _entry_probe(
            "transitions_stream_digest"
        ),
        # line dedup over the rewrap bridge: the per-copy token
        # suffixes keep copies' lines disjoint, so common-line density
        # per copy stays sf0.1-like while line space grows 10x — the
        # same "more distinct docs, same distribution" shape as above
        "strip_common_lines": lambda s, d: dedup.strip_common_lines(
            dedup.docs_as_lines(docs(s, d))
        ),
    }


def store_probe(spark) -> dict:
    """Stored-index daily-drop probe: the O(batch)-per-drop claim,
    measured. The sf1 replica's 10 disjoint copies play 10 daily
    drops of CONSTANT size; the store grows one drop per round.

    - line index: drop 0 seeds `{prefix}_lines`, then each drop k is
      STRIP-timed against the k-drop store and appended; flat strip
      time across k is the claim (store-side work is the bucketed
      exchange-free fold, batch-side work is constant). Compaction
      then folds the partial tail and the last drop re-strips.
    - LSH index: rebuilt at 1/5/9-copy sizes (the writer is one-shot
      by design — ingest-time materialization), with copy 9 as the
      fixed probe drop each time; flat check time is the claim
      (banded equi-join touches only the probe's buckets).
    """
    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.operators import dedup
    from py_etl_pipeline_woocommerce_spark.sources.bucketing import drop_table

    docs = load_table(spark, DST, "documents")
    copy_col = "doc_id div {off}".format(off=KEY_OFFSET)

    def drop_k(k):
        return docs.filter(f"({copy_col}) = {k}")

    out: dict = {"line_strip_sec": [], "lsh_check_sec": {}}
    prefix = "probe_store"
    try:
        lines0 = dedup.docs_as_lines(drop_k(0))
        dedup.write_line_index(lines0, prefix, mode="overwrite")
        # one untimed strip absorbs codegen/JIT so drop 1's timing is
        # as warm as drop 9's
        dedup.strip_against_line_index(
            dedup.docs_as_lines(drop_k(1)), prefix
        ).count()
        for k in range(1, COPIES):
            lines_k = dedup.docs_as_lines(drop_k(k))
            spark.catalog.clearCache()
            t0 = time.time()
            dedup.strip_against_line_index(lines_k, prefix).count()
            out["line_strip_sec"].append(round(time.time() - t0, 2))
            dedup.write_line_index(lines_k, prefix, batch_id=k)
        t0 = time.time()
        dedup.compact_line_index(spark, prefix)
        out["line_compaction_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        dedup.strip_against_line_index(
            dedup.docs_as_lines(drop_k(COPIES - 1)), prefix
        ).count()
        out["line_strip_post_compaction_sec"] = round(time.time() - t0, 2)
        first, last = out["line_strip_sec"][0], out["line_strip_sec"][-1]
        out["line_flat_ratio"] = round(last / first, 3) if first else None

        probe = drop_k(COPIES - 1)
        # untimed warm check against the smallest store first
        for n in (1, 5, 9):
            corpus = docs.filter(f"({copy_col}) < {n}")
            dedup.write_lsh_index(corpus, prefix)
            if n == 1:
                dedup.dedup_against_index(probe, prefix).count()
            spark.catalog.clearCache()
            t0 = time.time()
            dedup.dedup_against_index(probe, prefix).count()
            out["lsh_check_sec"][f"store_{n}x"] = round(time.time() - t0, 2)
        s = out["lsh_check_sec"]
        out["lsh_flat_ratio"] = (
            round(s["store_9x"] / s["store_1x"], 3) if s["store_1x"] else None
        )
    finally:
        for t in (f"{prefix}_lines", f"{prefix}_bands", f"{prefix}_shingles"):
            drop_table(spark, t)
    return out


def skew_probe(spark) -> dict:
    """Skew-resilience measurement — the one scale claim that was
    plan-asserted only until r9: time the salted shapes against their
    naive twins on a UNIFORM key and on a SKEWED key (one hot key
    holding ~30% of rows), same row counts both ways.

    - agg: ``salted_sum`` (returnflag_totals' two-phase device) vs a
      plain groupBy-sum. Spark's map-side partial aggregation already
      collapses hot SUM keys per partition, so the naive agg is
      EXPECTED to stay flat too — recorded to show salting costs
      nothing, not to manufacture a win.
    - join: ``salted_join`` vs a plain shuffle join (dim carries a
      merge hint — the "too big to broadcast" case salting exists
      for; a broadcastable dim never skews). The naive skewed join is
      timed twice: with AQE's skew-join splitting ON (the session
      default) and OFF — the OFF number is the raw straggler cost a
      pre-AQE engine (or a shape AQE can't split) pays, the ON number
      shows AQE handling it, and the salted number must sit near the
      uniform baseline either way.

    Timing follows the module convention: one untimed warm pass per
    shape, clearCache between timed passes.
    """
    from pyspark.sql import functions as F

    from py_etl_pipeline_woocommerce_spark.operators.skew import (
        salted_join,
        salted_sum,
    )

    N_FACT = 20_000_000
    N_KEYS = 200_000
    uniform = spark.range(N_FACT).select(
        F.pmod(F.xxhash64("id"), F.lit(N_KEYS)).alias("key"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    # ~30% of rows land on key 0, the rest stay uniform
    skewed = spark.range(N_FACT).select(
        F.when(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10)) < 3, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .alias("key"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("key"),
        F.repeat(F.lit("x"), 64).alias("payload"),
    )

    def timed(fn):
        fn()  # warm: codegen/JIT
        spark.catalog.clearCache()
        t0 = time.time()
        fn()
        return round(time.time() - t0, 2)

    out: dict = {"n_fact": N_FACT, "n_keys": N_KEYS, "agg": {}, "join": {}}
    for label, fact in (("uniform", uniform), ("skewed", skewed)):
        out["agg"][f"naive_{label}"] = timed(
            lambda: fact.groupBy("key").agg(F.sum("v")).count()
        )
        out["agg"][f"salted_{label}"] = timed(
            lambda: salted_sum(fact, ["key"], "v", n_salts=32).count()
        )
        out["join"][f"naive_{label}"] = timed(
            lambda: fact.join(dim.hint("merge"), "key").count()
        )
        out["join"][f"salted_{label}"] = timed(
            lambda: salted_join(fact, dim.hint("merge"), ["key"], 32).count()
        )
    aqe_key = "spark.sql.adaptive.skewJoin.enabled"
    prior = spark.conf.get(aqe_key)
    try:
        spark.conf.set(aqe_key, "false")
        out["join"]["naive_skewed_noaqe"] = timed(
            lambda: skewed.join(dim.hint("merge"), "key").count()
        )
    finally:
        spark.conf.set(aqe_key, prior)
    for section in ("agg", "join"):
        s = out[section]
        s["salted_skew_ratio"] = (
            round(s["salted_skewed"] / s["salted_uniform"], 3)
            if s["salted_uniform"]
            else None
        )
    return out


def main() -> None:
    if "--regen" in sys.argv and os.path.exists(DST):
        shutil.rmtree(DST)
    if not os.path.exists(os.path.join(DST, "orders.parquet")):
        print("generating sf1 replica ...", file=sys.stderr)
        generate()
    # a replica generated before r9 lacks the dimension tables the
    # dashboard probes read — backfill them without a full regen
    for dim in ("customer", "nation", "region"):
        p = os.path.join(DST, f"{dim}.parquet")
        srcp = os.path.join(SRC, f"{dim}.parquet")
        if not os.path.exists(p) and os.path.exists(srcp):
            shutil.copyfile(srcp, p)
    # a replica generated before r9b lacks the 10x embeddings the
    # outlier probe reads — backfill with the same offset scheme
    if not os.path.exists(os.path.join(DST, "embeddings.parquet")):
        _replicate_embeddings(DST, SRC)
    # a replica generated before r12 lacks the 10x events the
    # streaming-digest probes replay — backfill with the
    # disjoint-time-era scheme
    if not os.path.exists(os.path.join(DST, "events.parquet")):
        _replicate_events(DST, SRC)

    from py_etl_pipeline_woocommerce_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    if "--store" in sys.argv:
        result = store_probe(spark)
        print(json.dumps({"sf_big": DST, "store_probe": result}))
        return

    if "--skew" in sys.argv:
        print(json.dumps({"skew_probe": skew_probe(spark)}))
        return

    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = {"sf_small": SRC, "sf_big": DST, "queries": {}}
    for name, fn in probes().items():
        if only and name not in only:
            continue
        # warm BOTH scales untimed so each timed pass sees the same
        # codegen/JIT/file-listing/page-cache state — a cold sf1 side
        # would inflate every ratio10 with first-run overhead the
        # sf0.1 side had already amortized
        fn(spark, SRC).count()
        fn(spark, DST).count()
        spark.catalog.clearCache()
        t0 = time.time()
        n_small = fn(spark, SRC).count()
        t_small = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        n_big = fn(spark, DST).count()
        t_big = time.time() - t0
        ratio10 = t_big / (COPIES * t_small) if t_small > 0 else None
        out["queries"][name] = {
            "sec_sf01": round(t_small, 2),
            "sec_sf1": round(t_big, 2),
            "rows_sf01": n_small,
            "rows_sf1": n_big,
            "ratio10": round(ratio10, 3) if ratio10 is not None else None,
        }
        print(f"{name}: {out['queries'][name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
