"""Binary (sign) quantization: 1 bit per dimension, Hamming search.

The extreme point of the engine's quantization family (int8 SQ in
``operators/sq.py``, PQ/IVFPQ in ``operators/pq.py``, Matryoshka in
``functions/vector.py``): a d-dim float32 embedding compresses to
d bits — 32× — and similarity becomes Hamming distance over packed
64-bit words (``bit_count(xor)``, whole-stage-codegen integer ops).
Sign quantization preserves angular neighborhoods (it is 1-plane-
per-axis LSH), so the production pattern is binary prefilter →
exact float rerank on a small candidate set; ``bq_topk`` implements
both the raw Hamming top-k and the reranked form.

Scale shape: encoding is a pure projection (no shuffle, no Python);
a Hamming scan reads ONLY the packed codes (d/8 bytes/row instead of
4d — the float column is pruned); top-k is TakeOrdered, and the
rerank touches the float column for ``prefilter`` rows only.

No reference counterpart (the reference's search is exact in-memory
cosine, R/core.R:268-278); the packing arithmetic is shared bit-for-
bit with the DuckDB oracle (bit 63 lands on the sign bit — both
engines represent it as long MIN_VALUE).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bq_encode_expr", "bq_encode", "bq_pack_py", "bq_topk"]

_MIN_LONG = -9223372036854775808


def _word_expr(emb: Column, w: int, nbits: int) -> Column:
    """Pack dims [64w, 64w + nbits) into one long: bit j set iff the
    dimension is >= 0. Bit 63 is the long's sign bit — added as
    MIN_LONG, which is the identical two's-complement pattern."""
    acc = F.lit(0).cast("long")
    terms = F.aggregate(
        F.sequence(F.lit(0), F.lit(nbits - 1)),
        acc,
        lambda a, j: a
        + F.when(
            F.element_at(emb, j + F.lit(64 * w + 1)) >= 0,
            F.when(j == 63, F.lit(_MIN_LONG)).otherwise(
                F.call_function("shiftleft", F.lit(1).cast("long"), j)
            ),
        ).otherwise(F.lit(0).cast("long")),
    )
    return terms


def bq_encode_expr(emb_col: str, dim: int) -> Column:
    """``array<long>`` of ceil(dim/64) packed sign words — a pure
    column expression (use inside any select/withColumn)."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    emb = F.col(emb_col)
    words = []
    for w in range((dim + 63) // 64):
        nbits = min(64, dim - 64 * w)
        words.append(_word_expr(emb, w, nbits))
    return F.array(*words)


def bq_encode(
    df: DataFrame, emb_col: str, dim: int, out_col: str = "bq"
) -> DataFrame:
    """Materialize the packed codes next to the data (typically before
    writing — the scan-side win is reading codes INSTEAD of floats)."""
    return df.withColumn(out_col, bq_encode_expr(emb_col, dim))


def bq_pack_py(vec: Sequence[float]) -> list[int]:
    """Driver-side twin of :func:`bq_encode_expr` for literal queries
    — same packing, same sign-bit representation."""
    out = []
    for w in range((len(vec) + 63) // 64):
        acc = 0
        for j in range(min(64, len(vec) - 64 * w)):
            if vec[64 * w + j] >= 0:
                acc += _MIN_LONG if j == 63 else (1 << j)
        out.append(acc)
    return out


def bq_topk(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    query: Sequence[float],
    k: int,
    dim: Optional[int] = None,
    code_col: Optional[str] = None,
    prefilter: Optional[int] = None,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Top-k by Hamming distance between sign codes.

    - ``code_col`` given: codes are precomputed (the scan reads only
      them); otherwise they are packed on the fly from ``emb_col``
      (``dim`` required).
    - ``prefilter`` given: binary prefilter → exact float rerank —
      take ``prefilter`` candidates by (hamming, id), then exact
      cosine top-k among them; returns (id, hamming, similarity).
      Otherwise returns (id, hamming).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    qwords = bq_pack_py(list(query))
    if dim is not None and dim != len(query):
        raise ValueError(f"query dim {len(query)} != dim {dim}")
    if code_col is None:
        if dim is None:
            raise ValueError("dim is required when code_col is not given")
        code = bq_encode_expr(emb_col, dim)
    else:
        code = F.col(code_col)
    # Width guard for stored codes: zip_with pads the shorter array
    # with NULLs, bit_count(NULL) would null the Hamming sum and the
    # ascending orderBy would surface those NULLs as the "best" rows —
    # a dim mismatch must be an error, not an arbitrary top-k.
    ham = F.aggregate(
        F.zip_with(
            code,
            F.array(*[F.lit(int(q)).cast("long") for q in qwords]),
            lambda c, q: F.bit_count(c.bitwiseXOR(q)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    if code_col is not None:
        ham = F.when(F.size(code) == len(qwords), ham).otherwise(
            F.raise_error(
                F.lit(
                    f"bq code width mismatch: query packs to {len(qwords)} "
                    f"word(s) but stored '{code_col}' codes differ — "
                    "check the query dimension against the index dim"
                )
            ).cast("long")
        )
    scored = df.select(F.col(id_col), ham.alias("hamming"))
    if prefilter is None:
        return scored.orderBy(F.asc("hamming"), F.asc(id_col)).limit(k)
    if prefilter < k:
        raise ValueError("prefilter must be >= k")
    from tidyvec_spark.functions.vector import cosine_sim_expr

    cand = scored.orderBy(F.asc("hamming"), F.asc(id_col)).limit(prefilter)
    qlit = F.array(*[F.lit(float(x)) for x in query])
    sim = cosine_sim_expr(F.col(emb_col).cast("array<double>"), qlit)
    if round_to is not None:
        sim = F.round(sim, round_to)
    # join FIRST, score after: with the projection below the join the
    # cosine (and the float-column read) would run for every corpus
    # row before probing the broadcast hash table — the prefilter
    # would save nothing. Scoring the joined frame keeps the float
    # scan at `prefilter` rows, which is the operator's whole point.
    rer = (
        df.select(id_col, emb_col)
        .join(F.broadcast(cand), id_col)
        .select(F.col(id_col), F.col("hamming"), sim.alias("similarity"))
    )
    return (
        rer.orderBy(F.desc("similarity"), F.asc(id_col))
        .limit(k)
        .select(id_col, "hamming", "similarity")
    )
