"""PCA: one-pass distributed moments, driver eigendecomposition,
Arrow-batched projection.

The SemDeDup-style pipelines (semantic dedup, embedding clustering,
IVF coarse quantization) all get cheaper after linear dimensionality
reduction; random projection (``operators/rproject.py`` twin in
``search.py``'s rproject bench leg) is data-oblivious, PCA is the
data-optimal linear map — worth one extra corpus pass.

Reference scope note: the reference (pinecone-io/pinecone-datasets) is
an I/O library with no vector operators — this module is part of the
Layer-B training-pipeline extension (SURVEY.md §2's "beyond the
reference" set).

Scale shapes (what survives 100 TB):

* ``train_pca``: the ONLY corpus pass computes per-partition moment
  partials — (count, Σv, Σv⊗v) — inside one Arrow-batched
  ``mapInPandas``; each partition emits exactly ONE row of
  1 + d + d² doubles, so the collect is partitions-bounded (a 1000-task
  scan of 768-dim vectors collects ~4.7 MB/task-row ≈ bounded driver
  work), never corpus-bounded. The d×d eigenproblem is driver-local
  microseconds-to-ms for embedding dims.
* ``pca_project``: map-only — the (d × out_dim) component matrix rides
  into each task in the UDF closure; one BLAS matmul per Arrow batch.
  No shuffle anywhere in train or project.

Determinism: moment partials are exact sums per partition; the driver
folds them in partition order. Eigenvector sign is pinned (largest-
magnitude coefficient made positive) so components are reproducible
run-to-run for identical input.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _moments_fn(vector_col: str, dim: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        ss = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vector_col]]
            )
            n += m.shape[0]
            s += m.sum(axis=0)
            # one rank-b update per Arrow batch, never a (b, d, d) cube
            ss += m.T @ m
        if n == 0:
            return
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
        )

    return fn


def train_pca(
    documents: DataFrame,
    out_dim: int,
    vector_col: str = "values",
    dim: Optional[int] = None,
    center: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA over ``vector_col``; returns ``(components, mean,
    explained_variance_ratio)`` with shapes ``(dim, out_dim)``,
    ``(dim,)``, ``(out_dim,)``.

    Exact (no sampling): the full-corpus second moment is one bounded
    aggregation — unlike KMeans there is no iteration, so there is
    nothing a sample would save. ``dim`` is probed from the first row
    when not given (one tiny job).
    """
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1: {out_dim}")
    if dim is None:
        first = documents.select(F.size(vector_col).alias("d")).first()
        if first is None:
            raise ValueError("train_pca: empty input")
        dim = int(first["d"])
    if out_dim > dim:
        raise ValueError(f"out_dim {out_dim} > dim {dim}")
    partials = documents.select(vector_col).mapInPandas(
        _moments_fn(vector_col, dim),
        schema="n long, s array<double>, ss array<double>",
    )
    n_total = 0
    s = np.zeros(dim, dtype=np.float64)
    ss = np.zeros((dim, dim), dtype=np.float64)
    for row in partials.collect():  # partitions-bounded, one row each
        n_total += row["n"]
        s += np.asarray(row["s"], dtype=np.float64)
        ss += np.asarray(row["ss"], dtype=np.float64).reshape(dim, dim)
    if n_total < 2:
        raise ValueError(f"train_pca: need >= 2 rows, got {n_total}")
    mean = s / n_total if center else np.zeros(dim, dtype=np.float64)
    cov = ss / n_total - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:out_dim]
    comps = evecs[:, order]
    top = np.abs(comps).argmax(axis=0)
    signs = np.sign(comps[top, np.arange(comps.shape[1])])
    signs[signs == 0] = 1.0
    comps = comps * signs  # pin sign: largest-|coef| positive
    total_var = float(np.maximum(evals, 0.0).sum())
    ratio = (
        np.maximum(evals[order], 0.0) / total_var
        if total_var > 0
        else np.zeros(out_dim)
    )
    return comps, mean, ratio


def train_opq_rotation(
    documents: DataFrame,
    m: int,
    vector_col: str = "values",
    dim: Optional[int] = None,
    center: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """OPQ-style rotation for product quantization: PCA decorrelation +
    eigenvalue allocation (the parametric OPQ baseline of Ge et al.
    2013, "Optimized Product Quantization", §4 — no iterative R/codebook
    alternation, one closed form from the same one-pass moments as
    ``train_pca``).

    PQ quantizes each of ``m`` subspaces independently, so it wastes
    budget when (a) dimensions are correlated across subspace borders
    and (b) variance is concentrated in one subspace. The fix: rotate
    into the PCA basis (kills correlation), then deal the principal
    directions to subspaces greedily so each subspace's variance
    PRODUCT is balanced — every codebook then carries comparable
    information.

    Returns ``(R, mean)`` with ``R`` orthogonal ``(dim, dim)``: encode
    ``(v - mean) @ R`` (use ``pca_project(documents, R, mean)``), then
    PQ the rotated vectors; rotate queries identically at search time.
    Rotation preserves dot products and L2 distances of centered
    vectors, so ADC scores over rotated space rank exactly as in the
    original space. For dot/cosine metrics pass ``center=False``:
    translation changes dot products and norms, but a pure rotation
    (mean pinned to 0) leaves both bit-identical — the index path
    (``pq.build_ivfpq_index(opq=True)``) relies on this.
    """
    if dim is None:
        first = documents.select(F.size(vector_col).alias("d")).first()
        if first is None:
            raise ValueError("train_opq_rotation: empty input")
        dim = int(first["d"])
    if m < 1 or dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    comps, mean, ratio = train_pca(
        documents, out_dim=dim, vector_col=vector_col, dim=dim,
        center=center,
    )
    dsub = dim // m
    # Greedy balance of log-variance, in strict fill rounds: each
    # descending eigenvalue goes to the LEAST-FILLED subspace with the
    # smallest variance product. Restricting to least-filled makes
    # every comparison happen between equal-count products, so the
    # allocation is invariant to eigenvalue scaling (the unconstrained
    # greedy compares products of unequal length, where a global scale
    # — or the ratio normalization — flips decisions).
    sub_log = np.zeros(m)
    sub_fill = np.zeros(m, dtype=int)
    slots: list[list[int]] = [[] for _ in range(m)]
    for idx in range(dim):  # ratio (and comps) already sorted desc
        open_subs = np.flatnonzero(sub_fill < dsub)
        elig = open_subs[sub_fill[open_subs] == sub_fill[open_subs].min()]
        j = elig[np.argmin(sub_log[elig])]
        slots[j].append(idx)
        sub_log[j] += float(np.log(max(ratio[idx], 1e-30)))
        sub_fill[j] += 1
    perm = [i for sub in slots for i in sub]
    return np.ascontiguousarray(comps[:, perm]), mean


def pca_project(
    documents: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vector_col: str = "values",
    out_col: str = "pca",
) -> DataFrame:
    """Append ``out_col = (v - mean) @ components`` — map-only, one BLAS
    matmul per Arrow batch, components in the closure (KBs)."""
    comps = np.ascontiguousarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)

    @pandas_udf("array<double>")
    def kernel(vecs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if m.size == 0:
            return pd.Series([], dtype=object)
        proj = (m - mu) @ comps
        return pd.Series(list(proj))

    return documents.withColumn(out_col, kernel(F.col(vector_col)))
