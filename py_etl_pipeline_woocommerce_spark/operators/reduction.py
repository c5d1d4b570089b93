"""Embedding dimensionality reduction: exact PCA via a single-pass
distributed Gramian.

The training-data use case: 100 TB of 1k-dim embeddings are too wide
for downstream clustering/ANN index builds; PCA to 8-64 dims keeps
the geometry (and the IVF/LSH recall) at a fraction of the shuffle
width. The classic scalable construction (public: Halko et al. 2011
review the Gramian route; every MLlib/Sklearn PCA does the same):

1. ONE distributed pass accumulates the d-vector of sums and the
   d x d second-moment matrix as integer-position partial aggregates
   (map-side combinable, d^2 rows cross the shuffle — KB-sized,
   independent of corpus size).
2. The driver forms the covariance (O(d^2) memory) and runs a dense
   symmetric eigendecomposition (O(d^3) — microseconds for any d that
   fits a Spark row anyway).
3. Projection is a stateless map: each output coordinate is one
   fused zip_with/aggregate dot product against a literal component
   — no shuffle, no Python, streams at scan speed.

Driver check is rows-only by design: eigenvectors are not
SQL-expressible. The pytest suite asserts the linear-algebra
contract instead (orthonormal components, descending explained
variance, reconstruction error shrinking as k grows, parity with
numpy's exact PCA on the same rows).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col="embedding"):
    return F.transform(col, lambda x: x.cast("double"))


def pca_fit(embeddings: DataFrame, k: int = 8) -> dict:
    """Fit exact PCA; returns plain Python state (the "model"):
    ``{"mean": [d], "components": [k][d], "explained": [k], "dim": d}``.

    Components are sign-canonicalized (largest-|coefficient| entry
    positive) so refits are reproducible run-to-run.
    """
    dims = (
        embeddings.select(F.size("embedding").alias("d"))
        .distinct()
        .limit(3)
        .collect()
    )
    if not dims:
        raise ValueError(
            "pca_fit: cannot fit on an empty embeddings frame (no "
            "dimensionality to infer) — fit on history, then project "
            "batches with pca_project(model=...)"
        )
    # each degenerate input gets ITS OWN named refusal — a NULL array
    # makes F.size yield NULL and an all-empty corpus yields zero
    # moment rows, and letting either fall through produced masking
    # TypeErrors/IndexErrors instead of the real cause
    sizes = [r["d"] for r in dims]
    if any(s is None for s in sizes):
        raise ValueError(
            "pca_fit: some rows have NULL embedding arrays — drop or "
            "repair upstream before fitting"
        )
    if len(sizes) > 1:
        # ragged inputs would silently corrupt the moment frame (per-
        # position counts stop being the row count) or IndexError on
        # positions past d+d² — refuse with the real cause
        raise ValueError(
            "pca_fit: embeddings are ragged — got dimensionalities "
            f"{sorted(sizes)}; fix upstream before fitting"
        )
    dim = sizes[0]
    if dim == 0:
        raise ValueError(
            "pca_fit: embeddings are zero-length arrays — nothing to fit"
        )
    if k > dim:
        raise ValueError(
            f"pca_fit: k={k} exceeds the embedding dimensionality "
            f"{dim} — at most dim components exist"
        )
    e = _as_double()
    # a NULL ELEMENT inside an array silently biases the fit (F.sum
    # skips the null product but the count still counts the row, so
    # the affected mean/covariance entries drift toward 0) — fuse a
    # loud per-row check into the staged column, same device as
    # pca_project's dim guard below
    checked = embeddings.select(
        F.when(
            F.exists("embedding", lambda x: x.isNull()),
            F.raise_error(
                F.concat(
                    F.lit("pca_fit: embedding contains NULL elements "),
                    F.lit("(vec_id "),
                    F.col("vec_id").cast("string"),
                    F.lit(")"),
                )
            ),
        )
        .otherwise(e)
        .alias("_e")
    )
    ce = F.col("_e")
    # one pass: positions [0, d) carry Σx_i, positions [d, d+d²) carry
    # Σ x_i·x_j (flattened outer product); count rides along.
    # Moment terms are quantized to a 1e-9 grid BEFORE summing (the
    # label_centroids device): a plain double sum depends on
    # partition/summation order, so the same data on a different
    # partitioning (or a task retry) would perturb the covariance in
    # the last ulps — and for near-degenerate eigenvalue pairs eigh
    # then returns a ROTATED basis, changing every projection. The
    # integer-grid sum is exact and associative (deterministic on any
    # layout) at a ≤1e-9 per-term quantization cost that PCA cannot
    # see above its own estimation noise.
    grid = F.floor(F.col("v") * F.lit(1e9)).cast("decimal(38,0)")
    moments = (
        checked.select(
            F.posexplode(
                F.concat(
                    ce,
                    F.flatten(
                        F.transform(
                            ce, lambda x: F.transform(ce, lambda y: x * y)
                        )
                    ),
                )
            ).alias("pos", "v")
        )
        .groupBy("pos")
        .agg(F.sum(grid).alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n = moments[0]["n"]
    flat = np.zeros(dim + dim * dim)
    for row in moments:
        flat[row["pos"]] = float(row["s"]) / 1e9
    mean = flat[:dim] / n
    second = flat[dim:].reshape(dim, dim) / n
    cov = second - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T  # k x d
    eigvals = np.maximum(eigvals[order], 0.0)
    for i in range(comps.shape[0]):  # sign canon: dominant coeff > 0
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    total_var = max(float(np.trace(cov)), 1e-300)
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained": (eigvals / total_var).tolist(),
        "dim": dim,
    }


def pca_project(
    embeddings: DataFrame, k: int = 8, model: dict | None = None
) -> DataFrame:
    """Project embeddings onto the top-``k`` principal axes.

    Output: ``vec_id, label, proj array<double>[k]``. ``model`` lets
    a stored fit score new batches without re-fitting (same
    train-offline/score-online split as ``dsir_score_with_model``).
    """
    model = pca_fit(embeddings, k) if model is None else model
    if k > len(model["components"]):
        # silently handing back fewer dimensions than asked would give
        # downstream consumers sized for k short vectors with no error
        raise ValueError(
            f"pca_project: k={k} exceeds the model's "
            f"{len(model['components'])} stored components — refit "
            "with a larger k or lower the request"
        )
    comps = model["components"][:k]
    e = _as_double()
    # a batch vector whose length differs from the model's dim — or
    # one holding a NULL element — would zip_with NULL into the dot
    # product and emit proj = [null, ...]: corrupt features with no
    # error anywhere. Fuse both checks into the staged column itself
    # (a separate pruned check column could be optimized away) so a
    # bad row fails the job loudly with the offending vec_id. A
    # whole-NULL embedding needs its own leading branch: size(NULL)
    # and exists(NULL, ...) both evaluate to NULL (not true), so the
    # dim/element checks fall through and .otherwise would hand back
    # a NULL array — the score-online path (model= from
    # read_pca_model) has no pca_fit pass to catch it.
    e_checked = (
        F.when(
            F.col("embedding").isNull(),
            F.raise_error(
                F.concat(
                    F.lit("pca_project: embedding is NULL (vec_id "),
                    F.col("vec_id").cast("string"),
                    F.lit(")"),
                )
            ),
        )
        .when(
            F.size("embedding") != F.lit(model["dim"]),
            F.raise_error(
                F.concat(
                    F.lit("pca_project: embedding dim "),
                    F.size("embedding").cast("string"),
                    F.lit(f" != model dim {model['dim']} (vec_id "),
                    F.col("vec_id").cast("string"),
                    F.lit(")"),
                )
            ),
        )
        .when(
            F.exists("embedding", lambda x: x.isNull()),
            F.raise_error(
                F.concat(
                    F.lit("pca_project: embedding contains NULL "),
                    F.lit("elements (vec_id "),
                    F.col("vec_id").cast("string"),
                    F.lit(")"),
                )
            ),
        )
        .otherwise(e)
    )
    staged = embeddings.select("vec_id", "label", e_checked.alias("_e"))
    offsets = [
        float(np.dot(model["mean"], c)) for c in comps
    ]  # Σ_j (x_j - μ_j)·w_j = x·w − μ·w, with μ·w folded on the driver
    coords = [
        (
            F.aggregate(
                F.zip_with(
                    "_e",
                    F.array(*[F.lit(float(w)) for w in c]),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            - F.lit(off)
        )
        for c, off in zip(comps, offsets)
    ]
    return staged.select(
        "vec_id", "label", F.array(*coords).alias("proj")
    )


def write_pca_model(spark, model: dict, path: str) -> None:
    """Persist a ``pca_fit`` model as a tiny parquet table — the
    train-offline/score-online split (companion to
    ``write_dsir_model``): row 0 is the mean, rows 1..k are the
    components (explained variance rides along on component rows).
    KB-sized at any corpus scale (k×d doubles)."""
    rows = [(0, -1.0, [float(x) for x in model["mean"]])]
    rows += [
        (i + 1, float(model["explained"][i]), [float(x) for x in c])
        for i, c in enumerate(model["components"])
    ]
    spark.createDataFrame(
        rows, "row_id int, explained double, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def read_pca_model(spark, path: str) -> dict:
    """Load a persisted PCA model back into the plain-dict form
    ``pca_project`` accepts; a stored fit scores new embedding
    batches (or a Structured Streaming frame — projection is a
    stateless map) without re-running the Gramian pass."""
    rows = sorted(
        spark.read.parquet(path).collect(), key=lambda r: r.row_id
    )
    mean = list(rows[0].vec)
    comps = [list(r.vec) for r in rows[1:]]
    return {
        "mean": mean,
        "components": comps,
        "explained": [r.explained for r in rows[1:]],
        "dim": len(mean),
    }
