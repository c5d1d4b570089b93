"""Measure the BPE trainer at its DEFAULT_MAX_VOCAB_WORDS cap
(VERDICT r11 item 7): build a junk-token corpus whose DISTINCT-token
space EXCEEDS the 1M cap (so the TakeOrdered cut actually truncates
and the driver merge loop runs at its bounded worst case), then
record wall time for (a) the distributed vocab aggregation +
capped collect and (b) the driver-side merge recurrence, plus the
driver's peak RSS. Run: `python tools/bpe_cap_probe.py [n_tokens]`.
Results belong in BASELINE.md ("Round-12 BPE cap profile").

The corpus is synthetic by design — real corpora under the cap are
exact and fast; the cap exists precisely for adversarial junk-token
floods, so that is what we measure.
"""

import os
import resource
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from py_etl_pipeline_woocommerce_spark.operators import bpe
from py_etl_pipeline_woocommerce_spark.session import get_spark


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    n_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("bpe_cap_probe")
    # 2M distinct ~10-char junk tokens, 200 per document; every token
    # unique so distinct-token space = token count (the flood case)
    per_doc = 200
    docs = (
        spark.range(n_tokens // per_doc)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(per_doc - 1)),
                    lambda j: F.concat(
                        F.lit("jx"),
                        (F.col("id") * per_doc + j).cast("string"),
                        F.substring(
                            F.md5((F.col("id") * per_doc + j).cast("string")),
                            1,
                            4,
                        ),
                    ),
                ),
            ).alias("text"),
        )
    )
    rss0 = rss_mb()
    t0 = time.time()
    v = bpe.vocab_counts(docs)
    rows = bpe._collect_capped_vocab(v, bpe.DEFAULT_MAX_VOCAB_WORDS)
    t_collect = time.time() - t0
    rss1 = rss_mb()
    t1 = time.time()
    merges, _ = bpe.train_merges_py(rows, 8)
    t_train = time.time() - t1
    rss2 = rss_mb()
    print(
        f"bpe_cap_probe: n_tokens={n_tokens} collected={len(rows)} "
        f"(cap={bpe.DEFAULT_MAX_VOCAB_WORDS}) "
        f"agg+collect={t_collect:.1f}s merge_loop(8)={t_train:.1f}s "
        f"rss {rss0:.0f}->{rss1:.0f}->{rss2:.0f} MB "
        f"merges={len(merges)}"
    )


if __name__ == "__main__":
    main()
