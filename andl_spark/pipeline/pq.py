"""Product-quantization codes for the persisted IVF index (r11;
VERDICT r10 item 6).

int8 quantization (simsearch.topk_int8) buys 4× on the vector payload;
product quantization is the standard next step: each vector's RESIDUAL
against its IVF cell centroid — residuals are what PQ compresses well,
the Jégou et al. 2011 IVFADC design FAISS ships as IndexIVFPQ — splits
into ``m`` sub-vectors, each encoded as the index of its nearest
codeword in a per-sub-quantizer codebook of :data:`PQ_KS` entries: ONE
BYTE per sub-vector, so a dim-1024 float vector (8 KB) serves from a
16–64 B code. At 100 TB that is the difference between an index whose
scan reads the corpus and one whose hot path reads ~1% of it: the
ADC pass scans ONLY (id, code, norm) columns — parquet column pruning
never opens the embedding bytes — and the exact re-rank touches
embeddings for the few surviving candidates per query.

Pieces (annindex wires them into build/append/serve):

- :func:`train_codebooks` — per-sub-quantizer Lloyd over a bounded
  deterministic residual sample (the trained_centroids seed-rule
  contract: smallest-id sample, driver-side numpy, build-time only);
- :func:`encode_udf` — Arrow-batched residual encoder for the write
  path (build, append, streaming ingest);
- :func:`adc_tables` / :func:`adc_score` — the asymmetric-distance
  kernel the serve path calls per (cell, query) group: one (m × ks)
  lookup table per query, then each candidate's approximate dot is m
  table lookups instead of dim multiplies.

Cosine under ADC: ``dot(q, v) = dot(q, c_cell) + dot(q, r)`` with
``r = v − c_cell``; the first term is exact per (query, cell), the
second sums per-sub LUT entries; the norm divides by the STORED exact
``vnorm`` (written beside the code), so only the numerator is
approximated — recall ≥ 0.9 against the exact path is pinned in tests
on clustered and smooth corpora, with exact re-rank restoring exact
top-k ordering among survivors.

Reference anchor: david-pfx/Andl has no ANN surface — this extends
SURVEY.md §2.8's index-persistence story.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: codewords per sub-quantizer — one byte per code by construction
PQ_KS = 256

#: residual-sample bound for codebook training (the bounded
#: deterministic driver-side class of trained_centroids; ~256 samples
#: per codeword at the default ks)
PQ_TRAIN_CAP = 65_536


def train_codebooks(residuals: np.ndarray, m: int, ks: int = PQ_KS,
                    seed: int = 42) -> np.ndarray:
    """(m, ks, dim/m) codebooks: per sub-vector, plain-L2 Lloyd over
    the residual sample (residuals are NOT unit vectors — spherical
    training would be wrong here; simsearch._np_lloyd's math is plain
    L2, its normalization is the caller's contract)."""
    from .simsearch import _np_lloyd

    n, dim = residuals.shape
    if dim % m != 0:
        raise ValueError(
            f"pq: dim {dim} is not divisible by m={m} sub-quantizers — "
            "pick m dividing the embedding width")
    dsub = dim // m
    out = np.empty((m, ks, dsub), dtype=np.float64)
    for s in range(m):
        out[s] = _np_lloyd(residuals[:, s * dsub:(s + 1) * dsub], ks,
                           seed + s)
    return out


def encode_np(X: np.ndarray, lids: np.ndarray, codebooks: np.ndarray,
              cent_by_cell: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes for vectors X assigned to cells lids."""
    m, _, dsub = codebooks.shape
    R = X - cent_by_cell[lids]
    codes = np.empty((len(X), m), dtype=np.uint8)
    for s in range(m):
        sub = R[:, s * dsub:(s + 1) * dsub]
        cb = codebooks[s]
        d = ((sub * sub).sum(1)[:, None] - 2.0 * (sub @ cb.T)
             + (cb * cb).sum(1)[None, :])
        codes[:, s] = np.argmin(d, axis=1).astype(np.uint8)
    return codes


def encode_udf(codebooks: np.ndarray, cent_by_cell: np.ndarray):
    """Arrow-batched (embedding, list_id) → binary PQ code for the
    index write path. NULL embedding or NULL cell (tombstones,
    unassignable rows) encode as NULL."""
    from pyspark.sql.functions import pandas_udf

    cb = np.ascontiguousarray(codebooks)
    cc = np.ascontiguousarray(cent_by_cell)

    @pandas_udf("binary")
    def enc(v: pd.Series, lid: pd.Series) -> pd.Series:
        valid = (v.notna() & lid.notna()).to_numpy()
        out = [None] * len(v)
        if valid.any():
            X = np.array(v[valid].tolist(), dtype=np.float64)
            L = lid[valid].to_numpy(dtype=np.int64)
            codes = encode_np(X, L, cb, cc)
            for i, pos in enumerate(np.flatnonzero(valid)):
                out[pos] = codes[i].tobytes()
        return pd.Series(out)

    return enc


def adc_tables(qvec: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(m, ks) lookup tables for one query: LUT[s][j] = dot(q_sub_s,
    codebook[s][j]). Cost dim × ks multiplies ONCE per (query, cell
    group); each candidate afterwards costs m lookups."""
    m, ks, dsub = codebooks.shape
    return np.einsum("sd,skd->sk",
                     qvec.reshape(m, dsub), codebooks)


def adc_score(codes: np.ndarray, luts: np.ndarray,
              q_dot_cent: float, qn: float,
              vnorm: np.ndarray) -> np.ndarray:
    """Approximate cosines for one (query, cell) block:
    (q·c_cell + Σ_s LUT[s][code_s]) / (|q| · |v|) with the stored
    exact vnorm in the denominator."""
    m = luts.shape[0]
    acc = luts[0][codes[:, 0]]
    for s in range(1, m):
        acc = acc + luts[s][codes[:, s]]
    with np.errstate(divide="ignore", invalid="ignore"):
        return (q_dot_cent + acc) / (qn * vnorm)
