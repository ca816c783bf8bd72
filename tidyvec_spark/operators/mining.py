"""Contrastive-pair mining over an embedded corpus.

Training embedding models (and re-rankers) needs batches of hard
negatives: for each anchor, the most-similar items that are NOT of the
anchor's class — near the decision boundary, where the gradient is.
Random negatives are trivially separable; mining the hard ones is a
similarity self-join with a label-disagreement predicate.

Scale shape: the self-join rides the LSH-bucketed path
(``operators/nearest.py::similarity_join_lsh``) — both sides bucketed
map-side by the same hyperplanes, candidates from the bucket equi-join
(never a cross join), exact rerank on candidates only, then a per-
anchor top-k window over candidate lists. The exact variant (broadcast
envelope) exists for small corpora and as the recall oracle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "crop_pairs",
    "event_sequences",
    "hard_negative_pairs",
    "ict_pairs",
    "margin_pairs",
    "mutual_topk_pairs",
]


def event_sequences(
    df: DataFrame,
    key_col: str,
    order_cols,
    item_col: str,
    max_len: int = 20,
) -> DataFrame:
    """Ordered per-key item sequences — the log→training-data step of
    behavioral/sequential-recommendation modeling (SASRec-style next-
    item prediction, session-based recsys): per ``key_col``, the first
    ``max_len`` ``item_col`` values in ``order_cols`` order, plus the
    total event count (so truncation is visible downstream).

    Determinism: items are collected as (order_cols..., item) structs
    and ``array_sort``-ed, so the sequence is a pure function of the
    data, not of partitioning — the final tie law is the full
    ``order_cols`` tuple, which should end in a unique id.

    Shape: ONE groupBy(key); per-key aggregation state is the key's
    own events (bounded by the cap only after sort — at 100 TB
    pre-filter to the modeling window first, e.g. last-90-days, which
    also bounds state). Returns (key, n_events, seq array)."""
    if int(max_len) < 1:
        raise ValueError("max_len must be >= 1")
    order_cols = list(order_cols)
    s = F.struct(
        *[F.col(c) for c in order_cols], F.col(item_col).alias("__it")
    )
    return (
        df.groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.slice(
                F.array_sort(F.collect_list(s)), 1, int(max_len)
            ).alias("__arr"),
        )
        .select(
            key_col,
            "n_events",
            F.transform(F.col("__arr"), lambda x: x["__it"]).alias("seq"),
        )
    )


def crop_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_frac: float = 0.1,
    max_frac: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Independent-cropping positive pairs (Contriever — Izacard et
    al. 2021, arXiv:2112.09118 §4.1): per document, TWO independent
    token spans become a positive (crop_a, crop_b) pair — the
    label-free contrastive generator that beat ICT on BEIR by letting
    the two views overlap arbitrarily instead of being complementary.
    Together with :func:`ict_pairs` (complementary views) and
    :func:`hard_negative_pairs` this completes the standard positive-
    pair menu.

    Laws (identical in the DuckDB twin, all via the engine-portable
    ``hash_unit`` — deterministic under any partitioning, re-saltable
    per epoch):
    - span length ``len_i = max(1, floor(n · (min_frac + u_i1 ·
      (max_frac − min_frac))))`` over the doc's n whitespace tokens;
    - span start ``start_i = floor(u_i2 · (n − len_i + 1))``
      (0-based), so every feasible window is equally likely;
    - crops join their tokens with one space; docs with zero tokens
      yield no pair.

    Zero shuffle, no Python — one map-side projection."""
    if not (0.0 < float(min_frac) <= float(max_frac) <= 1.0):
        raise ValueError(
            f"need 0 < min_frac <= max_frac <= 1, got "
            f"({min_frac}, {max_frac})"
        )
    from tidyvec_spark.functions.text import let, tokens
    from tidyvec_spark.operators.sampling import hash_unit

    lo, hi = float(min_frac), float(max_frac)

    def crop(ts: Column, n: Column, tag: str) -> Column:
        u1 = hash_unit(F.col(id_col), salt + tag + "len")
        u2 = hash_unit(F.col(id_col), salt + tag + "start")
        ln = F.greatest(
            F.lit(1),
            F.floor(n.cast("double") * (F.lit(lo) + u1 * F.lit(hi - lo)))
            .cast("int"),
        )
        start = F.floor(
            u2 * (n - ln + F.lit(1)).cast("double")
        ).cast("int")
        return F.array_join(F.slice(ts, start + 1, ln), " ")

    def body(ts: Column) -> Column:
        n = F.size(ts)
        ok = n >= F.lit(1)
        return F.struct(
            n.cast("long").alias("n_tokens"),
            F.when(ok, crop(ts, n, "a")).alias("crop_a"),
            F.when(ok, crop(ts, n, "b")).alias("crop_b"),
        )

    out = df.select(id_col, let(tokens(text_col), body).alias("__cp"))
    return out.filter(F.col("__cp.n_tokens") >= 1).select(
        id_col,
        F.col("__cp.n_tokens").alias("n_tokens"),
        F.col("__cp.crop_a").alias("crop_a"),
        F.col("__cp.crop_b").alias("crop_b"),
    )


def _b_side_cache(B, meth: str):
    """Per-task precompute for the broadcast side of :func:`_sim_block`
    — hoisted OUT of the per-Arrow-batch loop so the (possibly
    250k-row) broadcast matrix is reduced once per task, not once per
    batch."""
    import numpy as np

    if meth == "cosine":
        return np.sqrt((B * B).sum(axis=1))
    if meth == "euclidean":
        return (B * B).sum(axis=1)
    return None


def _sim_block(A, B, meth: str, b_cache=None):
    """Dense similarity block between row matrices ``A`` (m×d) and
    ``B`` (n×d) under the engine similarity laws (functions/vector.py):
    zero-norm cosine scores 0.0, euclidean is 1/(1+d). Shared by the
    self- and cross-collection GEMM edge generators so the two paths
    cannot drift. ``b_cache`` is :func:`_b_side_cache`'s per-task
    precompute (recomputed here when absent)."""
    import numpy as np

    if b_cache is None:
        b_cache = _b_side_cache(B, meth)
    if meth == "cosine":
        na = np.sqrt((A * A).sum(axis=1))
        denom = np.outer(na, b_cache)
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(denom == 0.0, 0.0, (A @ B.T) / denom)
    if meth == "dot":
        return A @ B.T
    d2 = (
        (A * A).sum(axis=1)[:, None]
        + b_cache[None, :]
        - 2.0 * (A @ B.T)
    )
    return 1.0 / (1.0 + np.sqrt(np.maximum(d2, 0.0)))


def hard_negative_pairs(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    label_col: str,
    k: int = 5,
    method: str = "cosine",
    planes: Optional[Sequence[Sequence[float]]] = None,
    probe_hamming: int = 1,
    round_to: Optional[int] = None,
) -> DataFrame:
    """(anchor_id, neg_id, similarity, neg_rank): per anchor, the
    top-``k`` most-similar rows whose ``label_col`` DIFFERS (ties →
    min neg_id). Self-pairs are excluded by construction (same row ⇒
    same label).

    With ``planes`` the candidate set comes from the LSH bucket join
    (the 100 TB path; recall is a property of nbits/probe_hamming);
    without, the exact join scores every pair — only for corpora whose
    smaller side broadcasts.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from tidyvec_spark.operators.nearest import (
        similarity_join_exact,
        similarity_join_lsh,
    )

    anchors = df.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col(emb_col).alias("__av"),
    )
    cands = df.select(
        F.col(id_col).alias("neg_id"),
        F.col(label_col).alias("neg_label"),
        F.col(emb_col).alias("__nv"),
    )
    if planes is None:
        joined = similarity_join_exact(
            anchors, cands, "__av", "__nv", method=method,
            left_id="anchor_id", right_id="neg_id", round_to=round_to,
        )
    else:
        joined = similarity_join_lsh(
            anchors, cands, "__av", "__nv", planes=planes,
            left_id="anchor_id", right_id="neg_id", method=method,
            probe_hamming=probe_hamming, round_to=round_to,
        )
    filt = joined.filter(F.col("anchor_label") != F.col("neg_label"))
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("similarity"), F.asc("neg_id")
    )
    return (
        filt.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= int(k))
        .select(
            "anchor_id", "neg_id", "similarity",
            F.col("neg_rank").cast("int").alias("neg_rank"),
        )
    )


def _exact_topk_edges_gemm(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    method: str,
    round_to: Optional[int],
    collect_row_bound: Optional[int] = 250_000,
) -> DataFrame:
    """Directed exact top-k edges via Arrow-batched BLAS — the scoring
    stage of :func:`mutual_topk_pairs`'s default path. The corpus
    matrix is collected ONCE (this path's documented broadcast
    envelope — past that, pass ``edges=`` from the ANN family) and
    broadcast to executors; each anchor batch scores as one
    ``A @ B.T`` tile and emits its top-k under the engine tie law
    (rounded sim desc, neighbor id asc). Replaces the previous
    'interpreted HOF similarity × n² cross-join rows + window
    shuffle' plan — measured 127 s → ~2 s at 500×500 on sf0.1 — with
    two BLAS calls per batch and NO shuffle at all. Zero-norm cosine
    scores 0.0, euclidean is 1/(1+d) (functions/vector.py laws).

    NULL embeddings are excluded on BOTH sides (the engine-wide
    NULL-embedding law: a NULL vector is neither anchor nor
    candidate), an empty corpus returns an empty edge frame, and the
    driver collect is bounded by ``collect_row_bound`` (raise the
    bound explicitly — or pass ``None`` — to opt a larger corpus in;
    past broadcast size pass ``edges=`` to mutual_topk_pairs
    instead) — mirroring ``ngram_jaccard_pairs``' exact_row_bound
    guard."""
    import numpy as np

    from pyspark.sql import types as T

    fields = {f.name: f.dataType for f in df.schema.fields}
    id_type = fields[id_col]
    kk, nd, meth = int(k), round_to, str(method)
    if meth not in ("cosine", "euclidean", "dot"):
        raise ValueError(f"unknown similarity method {meth!r}")

    out_schema = T.StructType(
        [
            T.StructField("a", id_type),
            T.StructField("b", id_type),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    # persisted so the guard count, the collect, and the lazy
    # mapInPandas input below share ONE evaluation of df's lineage
    # (which may be an expensive derived frame); an eager unpersist
    # here would drop the cache intent before the caller's action
    # re-reads it as the anchor stream, so the handle rides on the
    # result (_tidyvec_persisted, the dedup pair-generator convention)
    # for operators.dedup.release() after the terminal action
    valid = (
        df.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .persist()
    )
    if collect_row_bound is not None:
        n = valid.count()
        if n > int(collect_row_bound):
            valid.unpersist()
            raise ValueError(
                f"mutual_topk_pairs exact path would collect {n} rows "
                f"(> collect_row_bound={collect_row_bound}); pass an "
                f"ANN edge frame via edges= or raise collect_row_bound"
            )
    rows = valid.collect()
    if not rows:
        valid.unpersist()
        return df.sparkSession.createDataFrame([], out_schema)
    ids = np.array([r[0] for r in rows])
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    bc = df.sparkSession.sparkContext.broadcast((ids, mat))

    def run(batches):
        import numpy as np
        import pandas as pd

        ids_b, B = bc.value
        b_cache = _b_side_cache(B, meth)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.array([list(v) for v in pdf["__v"]], dtype=np.float64)
            aid = pdf["__a"].to_numpy()
            S = _sim_block(A, B, meth, b_cache)
            if nd is not None:
                S = np.round(S, nd)
            out_a, out_b, out_s = [], [], []
            for i in range(S.shape[0]):
                mask = ids_b != aid[i]
                cand = ids_b[mask]
                sims = S[i][mask]
                order = np.lexsort((cand, -sims))[:kk]
                out_a.extend([aid[i]] * len(order))
                out_b.extend(cand[order])
                out_s.extend(sims[order])
            yield pd.DataFrame({"a": out_a, "b": out_b, "sim": out_s})

    out = valid.select(
        F.col(id_col).alias("__a"), F.col(vec_col).alias("__v")
    ).mapInPandas(run, schema=out_schema)
    out._tidyvec_persisted = [valid]
    return out


def mutual_topk_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    method: str = "cosine",
    round_to: Optional[int] = None,
    edges: Optional[DataFrame] = None,
    collect_row_bound: Optional[int] = 250_000,
) -> DataFrame:
    """Reciprocal-kNN pair graph: (a, b) survives iff b is in a's
    top-k AND a is in b's top-k — the mutual-nearest-neighbor
    structure SemDeDup-style clustering, agglomerative community
    steps, and duplicate-cluster seeding all build on (mutuality
    prunes the hub/asymmetry artifacts a plain directed kNN graph is
    full of).

    Two stages with different scale stories, deliberately decoupled:

    - Directed top-k edges. Default: exact broadcast scoring + a
      per-anchor row_number window (tie law: score desc rounded to
      ``round_to``, then neighbor id asc — the engine-wide knn tie
      rule). For corpora past broadcast size pass ``edges=`` — any
      (a, b, sim) frame from the ANN family (LSH, IVF, BQ rerank)
      drops in, so the mutual filter composes with every index this
      engine has instead of hard-wiring one.
    - Mutual filter: canonicalize each directed edge to (min, max)
      and keep pairs observed in BOTH directions — one groupBy over
      the n·k edge list (bounded by the k budget, not n²), no
      self-join, and crucially no double evaluation of the scoring
      stage (a self-join on the reversed key re-runs the whole
      directed-edge lineage on both sides). The direction flag rides
      the canonical key, so duplicate directed edges (e.g. a
      duplicated id in the input) cannot fake mutuality — two
      same-direction observations stay one-directional. Similarity
      is symmetric for cosine/dot/euclidean so either direction
      carries the same score; self-edges are dropped defensively.

    Returns (a, b, sim) with a < b.
    """
    if int(k) < 1:
        raise ValueError("k must be >= 1")
    if edges is None:
        edges = _exact_topk_edges_gemm(
            df, id_col, vec_col, int(k), method, round_to,
            collect_row_bound=collect_row_bound,
        )
    und = edges.filter(F.col("a") != F.col("b")).select(
        F.least("a", "b").alias("a"),
        F.greatest("a", "b").alias("b"),
        F.col("sim").alias("sim"),
        (F.col("a") < F.col("b")).alias("__fwd"),
    )
    out = (
        und.groupBy("a", "b")
        .agg(
            F.max(F.col("__fwd").cast("int")).alias("__has_f"),
            F.max((~F.col("__fwd")).cast("int")).alias("__has_r"),
            F.max("sim").alias("sim"),
        )
        .filter((F.col("__has_f") == 1) & (F.col("__has_r") == 1))
        .select("a", "b", "sim")
    )
    # the GEMM stage's anchor cache rides through so callers can
    # operators.dedup.release(out) after the terminal action
    out._tidyvec_persisted = getattr(edges, "_tidyvec_persisted", [])
    return out


def _exact_cross_topk_edges_gemm(
    anchors: DataFrame,
    aid: str,
    avec: str,
    corpus: DataFrame,
    cid: str,
    cvec: str,
    k: int,
    method: str = "cosine",
    round_to: Optional[int] = None,
    collect_row_bound: Optional[int] = 250_000,
) -> DataFrame:
    """Directed exact top-k edges ANCHORS→CORPUS across two
    collections (the two-frame sibling of :func:`_exact_topk_edges_gemm`
    with no self-exclusion — the id namespaces are independent). The
    CORPUS side is collected once (bounded by ``collect_row_bound`` —
    past broadcast size pass ANN ``edges=`` to the caller instead) and
    broadcast; anchors stream through one Arrow-batched ``mapInPandas``
    scoring one BLAS tile per batch. Zero shuffle. NULL embeddings are
    excluded on both sides (the engine-wide NULL-embedding law).

    Returns (a, b, sim): a from ``anchors``, b its rank-ordered
    corpus neighbors under the engine tie law (rounded sim desc, id
    asc)."""
    import numpy as np

    from pyspark.sql import types as T

    kk, nd, meth = int(k), round_to, str(method)
    if meth not in ("cosine", "euclidean", "dot"):
        raise ValueError(f"unknown similarity method {meth!r}")
    out_schema = T.StructType(
        [
            T.StructField("a", anchors.schema[aid].dataType),
            T.StructField("b", corpus.schema[cid].dataType),
            T.StructField("sim", T.DoubleType()),
        ]
    )
    side = corpus.filter(F.col(cvec).isNotNull()).select(cid, cvec)
    if collect_row_bound is not None:
        side = side.persist()
        n = side.count()
        if n > int(collect_row_bound):
            side.unpersist()
            raise ValueError(
                f"margin_pairs exact path would collect {n} corpus "
                f"rows (> collect_row_bound={collect_row_bound}); pass "
                f"ANN edge frames via edges_fwd=/edges_bwd= or raise "
                f"collect_row_bound"
            )
    rows = side.collect()
    if collect_row_bound is not None:
        side.unpersist()
    if not rows:
        return anchors.sparkSession.createDataFrame([], out_schema)
    ids = np.array([r[0] for r in rows])
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    bc = anchors.sparkSession.sparkContext.broadcast((ids, mat))

    def run(batches):
        import numpy as np
        import pandas as pd

        ids_b, B = bc.value
        b_cache = _b_side_cache(B, meth)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.array([list(v) for v in pdf["__v"]], dtype=np.float64)
            aid_arr = pdf["__a"].to_numpy()
            S = _sim_block(A, B, meth, b_cache)
            if nd is not None:
                S = np.round(S, nd)
            out_a, out_b, out_s = [], [], []
            for i in range(S.shape[0]):
                order = np.lexsort((ids_b, -S[i]))[:kk]
                out_a.extend([aid_arr[i]] * len(order))
                out_b.extend(ids_b[order])
                out_s.extend(S[i][order])
            yield pd.DataFrame({"a": out_a, "b": out_b, "sim": out_s})

    return (
        anchors.filter(F.col(avec).isNotNull())
        .select(F.col(aid).alias("__a"), F.col(avec).alias("__v"))
        .mapInPandas(run, schema=out_schema)
    )


def margin_pairs(
    src: DataFrame,
    tgt: DataFrame,
    src_id: str,
    src_vec: str,
    tgt_id: Optional[str] = None,
    tgt_vec: Optional[str] = None,
    k: int = 4,
    threshold: float = 1.05,
    select: str = "threshold",
    round_to: Optional[int] = None,
    edges_fwd: Optional[DataFrame] = None,
    edges_bwd: Optional[DataFrame] = None,
    collect_row_bound: Optional[int] = 250_000,
) -> DataFrame:
    """Margin-based bitext/pair mining (Artetxe & Schwenk 2019,
    arXiv:1811.01136 §3.2, the CCMatrix/LASER miner): score every
    candidate cross-collection pair by its cosine RATIO to the two
    anchors' neighborhood averages,

        margin(x, y) = cos(x, y) / ((avgk(x) + avgk(y)) / 2),

    where ``avgk(x)`` is the mean similarity of x's k nearest
    neighbors in the OTHER collection. Absolute cosine thresholds
    fail on hubness (some vectors are near everything); the margin
    normalizes each pair by how promiscuous its endpoints are, which
    is what made mining 4.5B parallel sentences tractable. The same
    criterion mines (query, document) and (caption, image) pairs.

    Candidates are the union of forward (src→tgt) and reversed
    backward top-k edges; ``select="threshold"`` keeps every pair with
    margin ≥ ``threshold``, ``select="best"`` additionally keeps only
    each src anchor's argmax-margin pair (margin desc, tgt id asc —
    the CCMatrix forward selection).

    Laws: margin is 0.0 when the denominator is ≤ 0 (zero/negative
    neighborhoods — never a candidate worth keeping, and it keeps the
    expression ANSI-safe); similarities and margins round to
    ``round_to`` when given; NULL embeddings excluded on all sides.

    Scale shape: two directed GEMM edge passes (each broadcasts the
    OTHER side, bounded by ``collect_row_bound``) — or drop in ANN
    (a, b, sim) frames via ``edges_fwd=``/``edges_bwd=`` exactly as
    :func:`mutual_topk_pairs` does, making the mining one bounded
    n·k aggregation + two n·k joins past broadcast scale. Both edge
    frames are persisted (each feeds its avg AND the candidate
    union); handles ride the result for ``operators.dedup.release``.

    Returns (src_id, tgt_id, sim, margin)."""
    if int(k) < 1:
        raise ValueError("k must be >= 1")
    if select not in ("threshold", "best"):
        raise ValueError(f"unknown select mode {select!r}")
    tid = tgt_id if tgt_id is not None else src_id
    tvec = tgt_vec if tgt_vec is not None else src_vec
    inherited: list = []
    if edges_fwd is None:
        edges_fwd = _exact_cross_topk_edges_gemm(
            src, src_id, src_vec, tgt, tid, tvec, int(k),
            round_to=round_to, collect_row_bound=collect_row_bound,
        )
    if edges_bwd is None:
        edges_bwd = _exact_cross_topk_edges_gemm(
            tgt, tid, tvec, src, src_id, src_vec, int(k),
            round_to=round_to, collect_row_bound=collect_row_bound,
        )
    inherited += getattr(edges_fwd, "_tidyvec_persisted", [])
    inherited += getattr(edges_bwd, "_tidyvec_persisted", [])
    # each edge frame feeds its neighborhood average AND the candidate
    # union — persist so the GEMM runs once per direction
    edges_fwd = edges_fwd.persist()
    edges_bwd = edges_bwd.persist()
    avg_f = edges_fwd.groupBy("a").agg(F.avg("sim").alias("__avg_src"))
    avg_b = edges_bwd.groupBy("a").agg(F.avg("sim").alias("__avg_tgt"))
    cands = (
        edges_fwd.select(
            F.col("a").alias("src_id"),
            F.col("b").alias("tgt_id"),
            "sim",
        )
        .unionByName(
            edges_bwd.select(
                F.col("b").alias("src_id"),
                F.col("a").alias("tgt_id"),
                "sim",
            )
        )
        .groupBy("src_id", "tgt_id")
        .agg(F.max("sim").alias("sim"))
    )
    # LEFT joins, not inner: with user-supplied ANN edge frames an
    # anchor can appear only on the reversed side (ANN found nothing
    # FROM it but something TO it), so its neighborhood average is
    # absent in one direction. An inner join would silently drop those
    # candidates; instead each missing average falls back to the
    # other endpoint's (at least one side exists by construction — a
    # candidate implies an edge). The exact path always has both, so
    # this changes nothing there.
    a_src = F.coalesce(F.col("__avg_src"), F.col("__avg_tgt"))
    a_tgt = F.coalesce(F.col("__avg_tgt"), F.col("__avg_src"))
    denom = (a_src + a_tgt) / F.lit(2.0)
    margin = F.when(denom > 0, F.col("sim") / denom).otherwise(F.lit(0.0))
    if round_to is not None:
        margin = F.round(margin, int(round_to))
    scored = (
        cands.join(
            avg_f.withColumnRenamed("a", "src_id"), "src_id", "left"
        )
        .join(avg_b.withColumnRenamed("a", "tgt_id"), "tgt_id", "left")
        .withColumn("margin", margin)
        .filter(F.col("margin") >= float(threshold))
        .select("src_id", "tgt_id", "sim", "margin")
    )
    if select == "best":
        w = Window.partitionBy("src_id").orderBy(
            F.desc("margin"), F.asc("tgt_id")
        )
        scored = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    scored._tidyvec_persisted = inherited + [edges_fwd, edges_bwd]
    return scored


def ict_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_sentences: int = 2,
    salt: str = "",
) -> DataFrame:
    """Inverse Cloze Task pairs (Lee et al. 2019, arXiv:1906.00300
    §3.1): per document, one sentence becomes the pseudo-QUERY and the
    remaining sentences its positive CONTEXT — the standard
    self-supervised (query, passage) pair generator for retrieval /
    embedding pre-training, no labels needed. Together with
    :func:`hard_negative_pairs` this closes the loop: ICT makes the
    positives, the miner makes the negatives.

    Laws (identical in the DuckDB twin):
    - sentence split: ``\\.\\s+|\\.$`` (period + whitespace, or the
      text-final period; RE2-safe — no lookbehind, so the split eats
      the periods and ``context`` joins surviving sentences with one
      space);
    - query pick: sentence index ``md5_long(salt || id) % n`` — the
      engine-portable deterministic choice (``rand(seed)`` depends on
      partitioning; the hash does not), re-saltable for fresh epochs;
    - documents with fewer than ``min_sentences`` sentences yield no
      pair (a query with an empty context teaches nothing).

    Returns (``id_col``, n_sentences, query, context). Entirely
    map-side single-pass codegen — zero shuffle, no Python."""
    if int(min_sentences) < 2:
        raise ValueError(
            f"min_sentences must be >= 2, got {min_sentences}"
        )
    from tidyvec_spark.functions.hashing import md5_long
    from tidyvec_spark.functions.text import let

    ms = int(min_sentences)

    def body(ss: Column) -> Column:
        n = F.size(ss)
        # every law below sits inside WHEN(ok, ...): CaseWhen evaluates
        # only the matched branch, so a zero-sentence document never
        # reaches pmod(x, 0) / element_at past the end (both ANSI
        # errors under Spark 4 defaults) — it produces NULL fields and
        # the filter below drops it, as documented
        ok = n >= F.lit(ms)
        qi = F.pmod(
            md5_long(
                F.concat(F.lit(salt), F.col(id_col).cast("string"))
            ),
            n.cast("long"),
        ).cast("int")
        query = F.when(ok, F.trim(F.element_at(ss, qi + 1)))
        context = F.when(
            ok,
            F.trim(
                F.array_join(
                    F.concat(
                        F.slice(ss, 1, qi),
                        F.slice(
                            ss, qi + 2, F.greatest(n - qi - 1, F.lit(0))
                        ),
                    ),
                    " ",
                )
            ),
        )
        return F.struct(
            n.cast("long").alias("n_sentences"),
            query.alias("query"),
            context.alias("context"),
        )

    sentences = F.filter(
        F.split(F.col(text_col), r"\.\s+|\.$"),
        lambda s: F.trim(s) != "",
    )
    out = df.select(
        id_col, let(sentences, body).alias("__ict")
    ).filter(F.col("__ict.n_sentences") >= int(min_sentences))
    return out.select(
        id_col,
        F.col("__ict.n_sentences").alias("n_sentences"),
        F.col("__ict.query").alias("query"),
        F.col("__ict.context").alias("context"),
    )
