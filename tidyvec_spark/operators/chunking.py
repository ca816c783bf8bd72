"""Document chunking and training-sequence packing (engine extension).

Two shapes every LLM data pipeline needs between "curated documents"
and "training batches":

- :func:`chunk_documents` — fixed-width character windows with
  overlap (the RAG / long-doc-splitting primitive). A pure projection:
  ``sequence`` of window starts → ``explode`` → ``substring``; zero
  shuffle, and the chunk count per document is ``ceil(len/stride)`` so
  output size is predictable from input stats.
- :func:`pack_sequences` — assign documents to fixed token-budget
  training sequences. Strategy ``"hash"`` (default, the 100 TB path)
  buckets documents by a salted md5 of their id, orders each bucket
  deterministically, and cuts the running token total at budget
  boundaries — the classic "concatenate then split at max_len" packing,
  expressed as ONE window cumsum per bucket (single shuffle on the
  bucket key, engine-portable, SQL-oracle-checkable). Strategy
  ``"ffd"`` runs greedy first-fit-decreasing inside each Spark
  partition via ``applyInPandas`` — tighter packing (fewer overflow
  splits) at the cost of partition-dependent assignment (deterministic
  given a fixed partitioning, not portable across engines; pytest pins
  its invariants instead of a SQL oracle).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tidyvec_spark.operators.sampling import hash_unit

__all__ = [
    "chunk_documents",
    "fim_split",
    "fim_order",
    "pack_sequences",
    "padding_report",
    "segment_runs",
    "truncation_report",
    "cdc_chunks",
]


def truncation_report(
    df: DataFrame,
    len_col: str,
    lengths: Sequence[int],
) -> DataFrame:
    """What each candidate context length costs — for every L in
    ``lengths``: documents truncated, tokens kept, tokens lost, and
    the lost fraction, from ONE conditional-aggregation pass (the
    max_seq_len decision is usually made from a histogram eyeball;
    this is the exact number). Rows come back one per L ascending.

    Shape: a single map-side-combined aggregate — 4·|lengths|
    conditional sums over one scan; no explode, no shuffle beyond the
    1-row reduction."""
    Ls = sorted({int(x) for x in lengths})
    if not Ls or Ls[0] < 1:
        raise ValueError("lengths must be non-empty, all >= 1")
    n = F.col(len_col).cast("long")
    aggs = []
    for L in Ls:
        kept = F.least(n, F.lit(L))
        aggs += [
            F.count("*").cast("long").alias(f"__n{L}"),
            F.sum(F.when(n > L, 1).otherwise(0)).cast("long").alias(
                f"__t{L}"
            ),
            F.sum(kept).cast("long").alias(f"__k{L}"),
            F.sum(n - kept).cast("long").alias(f"__l{L}"),
        ]
    row = df.filter(n.isNotNull()).agg(*aggs)
    per = F.array(
        *[
            F.struct(
                F.lit(L).alias("max_len"),
                F.col(f"__n{L}").alias("n_docs"),
                F.col(f"__t{L}").alias("n_truncated"),
                F.col(f"__k{L}").alias("tokens_kept"),
                F.col(f"__l{L}").alias("tokens_lost"),
            )
            for L in Ls
        ]
    )
    return (
        row.select(F.explode(per).alias("x"))
        .select("x.*")
        .withColumn(
            "lost_frac",
            F.when(
                F.col("tokens_kept") + F.col("tokens_lost") > 0,
                F.col("tokens_lost").cast("double")
                / (F.col("tokens_kept") + F.col("tokens_lost")).cast(
                    "double"
                ),
            ).otherwise(F.lit(0.0)),
        )
    )


def segment_runs(
    df: DataFrame,
    id_col: str,
    idx_col: str,
    label_col: str,
) -> DataFrame:
    """Collapse consecutive equal labels along ``idx_col`` into runs —
    the gaps-and-islands operator behind language-segment extraction
    (pull the English islands out of mixed-language pages, the
    per-paragraph refinement CCNet argues for), speaker turns, and
    quality-run trimming. Returns one row per run:
    (``id_col``, seg_idx from 0, ``label_col``, n, idx_lo, idx_hi).

    Labels compare NULL-safely (a NULL stretch is its own run, not
    glued to its neighbours). Shape: the lag and the running sum share
    ONE per-id window partitioning (a single shuffle), and the run
    rollup groups by (id, seg) — per-id state never exceeds the
    document's own rows, so 100 TB parallelism is document-granular.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(idx_col)
    prev = F.lag(F.col(label_col)).over(w)
    # the FIRST row always opens a run: lag() is NULL there, and a
    # NULL first label would null-safe-equal it (chg=0 → seg_idx -1,
    # shifting every later run) — force chg=1 at row_number 1
    chg = F.when(F.row_number().over(w) == 1, F.lit(1)).otherwise(
        F.when(
            F.col(label_col).eqNullSafe(prev), F.lit(0)
        ).otherwise(F.lit(1))
    )
    run = (
        df.select(id_col, idx_col, label_col)
        .withColumn("__chg", chg)
        .withColumn("__seg", (F.sum("__chg").over(w) - 1).cast("long"))
    )
    return (
        run.groupBy(id_col, "__seg")
        .agg(
            F.min(F.col(label_col)).alias(label_col),
            F.count("*").cast("long").alias("n"),
            F.min(idx_col).alias("idx_lo"),
            F.max(idx_col).alias("idx_hi"),
        )
        .select(
            id_col,
            F.col("__seg").alias("seg_idx"),
            label_col,
            "n",
            "idx_lo",
            "idx_hi",
        )
    )


def padding_report(
    df: DataFrame,
    id_col: str,
    len_col: str,
    batch_size: int = 32,
    n_buckets: int = 8,
    salt: str = "",
) -> DataFrame:
    """Padding-waste A/B of batch assembly orders — the measurement
    that justifies (or rejects) length-sorted batching for
    variable-length training/serving, run on the ACTUAL corpus instead
    of assumed length distributions.

    Every row is padded to its batch's max length, so waste depends
    entirely on how rows are grouped into size-``batch_size`` batches.
    Two deterministic orders are assembled inside hash buckets
    (bucket = salted-md5(id) · n_buckets — :func:`pack_sequences`' law,
    stable under repartitioning; buckets bound the window sorts
    executor-sized at 100 TB):

    - ``arrival``: hash order — the unsorted-dataloader baseline;
    - ``sorted``: by (length, id) — length-bucketed batching.

    Returns one row per strategy: (strategy, n_batches, n_docs,
    sum_len, padded, waste_frac) where padded = Σ_batches max_len ·
    n_rows and waste_frac = (padded − sum_len) / padded. ONE corpus
    scan: both assignments are computed per row, unpivoted, and
    aggregated in a single pass (the two windows share the bucket
    partitioning, so Catalyst reuses one exchange).
    """
    from pyspark.sql import Window

    from tidyvec_spark.operators.sampling import hash_unit

    if int(batch_size) < 1:
        raise ValueError("batch_size must be >= 1")
    if int(n_buckets) < 1:
        raise ValueError("n_buckets must be >= 1")
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(len_col).cast("long").alias("__len"),
        (hash_unit(F.col(id_col), salt) * n_buckets)
        .cast("int")
        .alias("bucket"),
        hash_unit(F.col(id_col), salt + "o").alias("__u"),
    )
    w_sorted = Window.partitionBy("bucket").orderBy("__len", "__id")
    w_arrival = Window.partitionBy("bucket").orderBy("__u", "__id")
    b = int(batch_size)
    assigned = base.select(
        "bucket",
        "__len",
        F.floor((F.row_number().over(w_sorted) - 1) / b).alias("__bs"),
        F.floor((F.row_number().over(w_arrival) - 1) / b).alias("__ba"),
    )
    long = assigned.select(
        "bucket",
        "__len",
        F.explode(
            F.array(
                F.struct(
                    F.lit("arrival").alias("strategy"),
                    F.col("__ba").alias("batch"),
                ),
                F.struct(
                    F.lit("sorted").alias("strategy"),
                    F.col("__bs").alias("batch"),
                ),
            )
        ).alias("x"),
    ).select("bucket", "__len", "x.strategy", "x.batch")
    per_batch = long.groupBy("strategy", "bucket", "batch").agg(
        F.max("__len").alias("mx"),
        F.sum("__len").alias("s"),
        F.count("*").alias("c"),
    )
    return (
        per_batch.groupBy("strategy")
        .agg(
            F.count("*").cast("long").alias("n_batches"),
            F.sum("c").cast("long").alias("n_docs"),
            F.sum("s").cast("long").alias("sum_len"),
            F.sum(F.col("mx") * F.col("c")).cast("long").alias("padded"),
        )
        .withColumn(
            "waste_frac",
            F.when(
                F.col("padded") > 0,
                (F.col("padded") - F.col("sum_len")).cast("double")
                / F.col("padded").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


def fim_split(
    df: DataFrame,
    text_col: str,
    id_col: str,
    rate: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022,
    arXiv:2207.14255): a ``rate`` fraction of documents is split into
    (prefix, middle, suffix) at two uniform character cuts so the
    trainer can rearrange them into PSM/SPM order and learn infilling;
    the rest pass through untransformed (``fim = false``, the paper's
    joint AR+FIM objective — §4.1 finds FIM-for-free up to ~90%).

    Laws (identical in the DuckDB twin):
    - transform iff ``hash_unit(id, salt||'fim') < rate`` — the
      engine-portable deterministic coin (``rand(seed)`` depends on
      partitioning; the hash does not), re-saltable per epoch;
    - cuts: ``c_i = floor(hash_unit(id, salt||'a'|'b') * (L+1))``
      over the character length L, lo = min, hi = max — so empty
      prefix/middle/suffix are all reachable, as the paper requires
      (the model must learn degenerate infills too);
    - untransformed rows carry (text, '', '') so every row has the
      same shape and downstream packing treats both objectives
      uniformly.

    Returns (``id_col``, fim, prefix, middle, suffix). Entirely
    map-side single-pass codegen — zero shuffle, no Python; documents
    of length 0 split into three empty strings, never an ANSI error
    (the cut is a multiply-floor, not a modulo)."""
    if not (0.0 <= float(rate) <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    t = F.col(text_col)
    length = F.length(t)
    pick = hash_unit(F.col(id_col), salt + "fim") < F.lit(float(rate))
    c1 = F.floor(
        hash_unit(F.col(id_col), salt + "a")
        * (length + F.lit(1)).cast("double")
    ).cast("int")
    c2 = F.floor(
        hash_unit(F.col(id_col), salt + "b")
        * (length + F.lit(1)).cast("double")
    ).cast("int")
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    return df.select(
        id_col,
        pick.alias("fim"),
        F.when(pick, t.substr(F.lit(1), lo)).otherwise(t).alias("prefix"),
        F.when(pick, t.substr(lo + 1, hi - lo))
        .otherwise(F.lit(""))
        .alias("middle"),
        F.when(pick, t.substr(hi + 1, length - hi))
        .otherwise(F.lit(""))
        .alias("suffix"),
    )


def fim_order(
    df: DataFrame,
    mode: str = "psm",
    seq_col: str = "seq",
) -> DataFrame:
    """Assemble :func:`fim_split` output into the training sequence —
    the sentinel orderings of Bavarian et al. 2022 §2 / App. D, which
    trains on a PSM+SPM MIXTURE (neither alone):

    - ``psm``: ``<fim_pre> P <fim_suf> S <fim_mid> M`` — the
      canonical prefix-suffix-middle layout;
    - ``spm``: ``<fim_pre> <fim_suf> S <fim_mid> P·M`` — suffix
      announced up front, then the prefix runs STRAIGHT INTO the
      middle with no sentinel between (App. D: the middle must
      continue the prefix exactly as in AR decoding, which is what
      makes SPM the cache-friendly inference layout).

    AR rows (``fim = false``) pass through as the bare document in
    both modes, so the joint objective stays one uniform column.
    Input keeps every column except (fim, prefix, middle, suffix),
    which collapse into ``seq_col``. Pure map-side concat — zero
    shuffle, extends whatever codegen stage feeds it."""
    modes = {
        "psm": F.concat(
            F.lit("<fim_pre> "), F.col("prefix"),
            F.lit(" <fim_suf> "), F.col("suffix"),
            F.lit(" <fim_mid> "), F.col("middle"),
        ),
        "spm": F.concat(
            F.lit("<fim_pre> <fim_suf> "), F.col("suffix"),
            F.lit(" <fim_mid> "), F.col("prefix"), F.col("middle"),
        ),
    }
    if mode not in modes:
        raise ValueError(
            f"unknown FIM order {mode!r}; expected one of {sorted(modes)}"
        )
    rest = [
        c for c in df.columns
        if c not in ("fim", "prefix", "middle", "suffix")
    ]
    return df.select(
        *rest,
        F.when(F.col("fim"), modes[mode])
        .otherwise(F.col("prefix"))
        .alias(seq_col),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    size: int = 512,
    overlap: int = 64,
    chunk_id: str = "chunk_idx",
    chunk_text: str = "chunk",
) -> DataFrame:
    """Split each document into ``size``-char windows starting every
    ``size - overlap`` chars (an empty/short document yields exactly
    one chunk). Output: every input column (text dropped) plus
    (chunk_idx from 0, chunk substring).

    Plan shape: projection + explode — no shuffle, no Python; chunking
    100 TB is exactly one scan."""
    size = int(size)
    stride = size - int(overlap)
    if size < 1 or stride < 1:
        raise ValueError("need size >= 1 and overlap < size")
    col = F.col(text_col)
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(col), F.lit(1)), F.lit(stride)
    )
    keep = [c for c in df.columns if c != text_col]
    return (
        df.select(*df.columns, F.explode(starts).alias("__start"))
        .select(
            *keep,
            F.expr(f"(__start - 1) DIV {stride}").cast("int").alias(chunk_id),
            F.substring(col, F.col("__start"), size).alias(chunk_text),
        )
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    divisor: int = 64,
    chunk_idx: str = "chunk_idx",
    chunk_text: str = "chunk",
) -> DataFrame:
    """Content-defined chunking — rolling-hash boundaries (the
    rsync / LBFS / restic law; Muthitacharoen et al. 2001): position
    ``i`` is a cut iff the 60-bit md5 hash of the ``window`` chars
    ending at ``i`` is ≡ 0 (mod ``divisor``). Boundaries depend only
    on LOCAL content, so an edit early in a document shifts the bytes
    but not the downstream cut points — chunks re-align after the
    edit, which is what makes chunk-level dedup / incremental diff
    stable where :func:`chunk_documents`'s fixed windows lose
    alignment after one inserted character. Expected chunk length ≈
    ``divisor`` chars (geometric).

    Output: one row per chunk — (``id_col``, ``chunk_idx``,
    ``chunk_text``, n_chars, chunk_hash) with chunk_hash = md5 of the
    chunk text, the key for cross-document boilerplate-chunk mining
    (groupBy chunk_hash) and snapshot diffing. Empty documents yield
    no rows.

    Scale: boundary detection + slicing is ONE map-side expression
    (O(len · window) hashing per document, zero shuffle); the explode
    emits ~len/divisor rows per doc. The md5-mod law is the engine-
    portable idiom every oracle replays bit-for-bit.
    """
    if int(window) < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if int(divisor) < 1:
        raise ValueError(f"divisor must be >= 1, got {divisor}")
    w, d = int(window), int(divisor)
    t = text_col
    from tidyvec_spark.functions.text import let

    # interior candidates stop one short of the end (a cut at the last
    # position is the end-of-document cut, listing it twice would make
    # an empty chunk); guard: sequence(a, b) DESCENDS when b < a, so
    # texts shorter than window+1 must yield no candidates at all
    interior = (
        f"IF(length({t}) >= {w} + 1, filter(CAST(sequence({w}, "
        f"length({t}) - 1) AS ARRAY<BIGINT>), i -> "
        f"CAST(conv(substr(md5(substring({t}, CAST(i - {w} + 1 AS INT), {w})), 1, 15), 16, 10) AS BIGINT) "
        f"% {d} = 0), CAST(array() AS ARRAY<BIGINT>))"
    )
    cuts = (
        f"concat(array(0L), {interior}, "
        f"array(CAST(length({t}) AS BIGINT)))"
    )

    # the cut array MUST be let-bound: higher-order functions run
    # interpreted and re-evaluate outer expressions per element, so
    # referencing the O(len·window) hash scan inside the per-chunk
    # transform would cost O(chunks · len · window) per document
    # (measured: 16x the let-bound plan at sf0.1, 50.3s -> 3.1s)
    def body(c: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(c) - 1),
            lambda j: F.struct(
                (j - F.lit(1)).cast("int").alias("idx"),
                F.col(t)
                .substr(
                    (F.element_at(c, j) + F.lit(1)).cast("int"),
                    (F.element_at(c, j + F.lit(1)) - F.element_at(c, j)).cast(
                        "int"
                    ),
                )
                .alias("chunk"),
            ),
        )

    piece = let(F.expr(cuts), body)
    return (
        df.filter(F.length(t) > 0)
        .select(
            F.col(id_col),
            F.explode(piece).alias("__p"),
        )
        .select(
            id_col,
            F.col("__p.idx").cast("int").alias(chunk_idx),
            F.col("__p.chunk").alias(chunk_text),
            F.length("__p.chunk").cast("long").alias("n_chars"),
            F.md5("__p.chunk").alias("chunk_hash"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int = 4096,
    n_buckets: int = 1024,
    salt: str = "",
    strategy: str = "hash",
    seq_col: str = "seq_id",
    offset_col: str = "seq_offset",
) -> DataFrame:
    """Assign every document a training sequence: output = input plus
    (bucket, ``seq_col``, ``offset_col``) where ``offset_col`` is the
    document's token offset inside its concatenated bucket stream and
    ``seq_col = offset DIV budget`` names the sequence its FIRST token
    lands in (concatenate-then-split packing: a document may straddle
    the boundary into ``seq_id + 1``; the trainer's splitter handles
    the carry, as usual for packed pretraining batches).

    ``hash``: bucket = salted-md5(id) mod ``n_buckets``; inside a
    bucket documents are ordered by id — fully deterministic, stable
    under repartitioning, one shuffle. Buckets bound the window sort:
    at 100 TB each bucket holds corpus/n_buckets tokens, so pick
    n_buckets to keep per-bucket sorts executor-sized.

    ``ffd``: greedy first-fit-decreasing within each Spark partition
    (documents larger than ``budget`` get a sequence of their own).
    Tighter packing for bounded inputs; assignment depends on the
    input partitioning.
    """
    budget = int(budget)
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if strategy == "hash":
        from pyspark.sql import Window

        bucket = (hash_unit(id_col, salt) * n_buckets).cast("int")
        w = (
            Window.partitionBy("bucket")
            .orderBy(F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = F.sum(F.col(token_col).cast("long")).over(w)
        out = (
            df.withColumn("bucket", bucket)
            .withColumn(offset_col, (cum - F.col(token_col)).cast("long"))
            .withColumn(
                seq_col, F.expr(f"{offset_col} DIV {budget}L").cast("long")
            )
        )
        return out
    if strategy == "ffd":
        return _pack_ffd(df, id_col, token_col, budget, seq_col, offset_col)
    raise ValueError(f"strategy must be hash|ffd, got {strategy!r}")


def _pack_ffd(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    seq_col: str,
    offset_col: str,
) -> DataFrame:
    """Greedy first-fit-decreasing per partition. ``bucket`` is the
    Spark partition id, and sequence ids are scoped to the bucket (same
    contract as the hash strategy). The partition's rows are gathered
    before packing — FFD needs the global (per-partition) size order —
    so per-partition data must fit one task's memory; that's the
    documented trade for the tighter packing."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("bucket", T.IntegerType(), False),
            T.StructField(seq_col, T.LongType(), False),
            T.StructField(offset_col, T.LongType(), False),
        ]
    )
    with_pid = df.withColumn("__pid", F.spark_partition_id())

    def pack(pdf_iter):
        import pandas as pd

        batches = [pdf for pdf in pdf_iter if len(pdf)]
        if not batches:
            return
        pdf = pd.concat(batches, ignore_index=True)
        pid = int(pdf["__pid"].iloc[0])
        pdf = pdf.drop(columns=["__pid"]).sort_values(
            [token_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        seq_ids = []
        offsets = []
        for t in pdf[token_col].astype("int64"):
            t = int(t)
            placed = None
            for i, fill in enumerate(fills):
                if fill + t <= budget:
                    placed = i
                    break
            if placed is None:
                placed = len(fills)
                fills.append(0)
            seq_ids.append(placed)
            offsets.append(fills[placed])
            fills[placed] += t
        pdf["bucket"] = pid
        pdf[seq_col] = pd.Series(seq_ids, dtype="int64")
        pdf[offset_col] = pd.Series(offsets, dtype="int64")
        yield pdf

    return with_pid.mapInPandas(pack, schema=out_schema)


def packing_report(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 1024,
    salt: str = "",
    round_to: int = 6,
) -> DataFrame:
    """Packing-efficiency report for :func:`pack_sequences`' hash
    strategy — the metric a training pipeline watches to know how much
    of every batch is padding: per bucket,
    ``n_seqs = ceil(tokens / budget)`` sequences exist and only the
    last is partial, so ``fill = tokens / (n_seqs · budget)`` IS the
    bucket's padded-token efficiency. Also counts oversize documents
    (> budget tokens — the ones the trainer's splitter must carry
    across sequence boundaries).

    Shape: ONE groupBy(bucket) aggregation (the same salted-md5 bucket
    law as ``pack_sequences``, so the report describes exactly the
    assignment the packer would produce) — no window, no join; the
    output is ``n_buckets`` rows regardless of corpus size.

    Returns (bucket, n_docs, n_tokens, n_oversize, n_seqs, fill)
    ordered by bucket.
    """
    from tidyvec_spark.operators.sampling import hash_unit

    budget = int(budget)
    if budget < 1:
        raise ValueError("budget must be >= 1")
    bucket = (hash_unit(id_col, salt) * n_buckets).cast("int")
    per = (
        df.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
            F.sum(
                (F.col(token_col).cast("long") > budget).cast("long")
            ).alias("n_oversize"),
        )
    )
    n_seqs = F.expr(f"(n_tokens + {budget - 1}) DIV {budget}")
    fill = F.round(
        F.col("n_tokens").cast("double")
        / (F.col("n_seqs") * budget).cast("double"),
        round_to,
    )
    return (
        per.withColumn("n_seqs", n_seqs.cast("long"))
        .withColumn("fill", fill)
        .orderBy("bucket")
    )


def length_buckets(
    df: DataFrame,
    token_col: str,
    n_buckets: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Length-bucketed inference batching: group documents into
    ``n_buckets`` equal-count buckets by token length and report each
    bucket's padding economics — the standard serving-side trick
    (batch similar lengths together so the pad-to-max waste collapses).

    Bucket law, fully integer and engine-portable: build the exact
    length histogram, cumulative-sum it in length order, and assign
    every LENGTH (hence every document of that length) to
    ``floor(docs_before_this_length * n_buckets / total_docs)``.
    Equal lengths always share a bucket — which is exactly what
    padding wants, since same-length rows pad to zero waste.

    Scale shape: the histogram groupBy is the only corpus-wide
    shuffle; the cumsum window runs over DISTINCT LENGTHS (bounded by
    max sequence length, thousands of rows at most, irrelevant at any
    corpus size). No global sort of the corpus, no single-partition
    window. A serving pipeline joins the returned length→bucket map
    (broadcast-sized) back to the corpus for the actual batch routing.

    Returns one row per non-empty bucket: ``(bucket, n_docs,
    min_tokens, max_tokens, sum_tokens, pad_frac)`` where ``pad_frac =
    1 - sum/(n·max)`` is the fraction of a pad-to-bucket-max batch
    that is padding; ordered by bucket.
    """
    if int(n_buckets) < 1:
        raise ValueError("n_buckets must be >= 1")
    hist = (
        df.select(F.col(token_col).cast("long").alias("len"))
        .groupBy("len")
        .agg(F.count("*").alias("cnt"))
    )
    assigned = hist.select(
        "len",
        "cnt",
        F.expr(
            f"(coalesce(sum(cnt) over (order by len rows between "
            f"unbounded preceding and 1 preceding), 0L) * {int(n_buckets)})"
            f" div (sum(cnt) over ())"
        ).alias("bucket"),
    )
    return (
        assigned.groupBy("bucket")
        .agg(
            F.sum("cnt").alias("n_docs"),
            F.min("len").alias("min_tokens"),
            F.max("len").alias("max_tokens"),
            F.sum(F.col("len") * F.col("cnt")).alias("sum_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "min_tokens",
            "max_tokens",
            "sum_tokens",
            F.round(
                F.when(
                    F.col("max_tokens") > 0,
                    F.lit(1.0)
                    - F.col("sum_tokens").cast("double")
                    / (F.col("n_docs") * F.col("max_tokens")).cast("double"),
                ).otherwise(0.0),  # all-empty bucket: nothing to pad
                round_to,
            ).alias("pad_frac"),
        )
        .orderBy("bucket")
    )


def span_corruption_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    p_start: float = 0.12,
    max_span: int = 3,
    salt: str = "",
    round_to: int | None = None,
) -> DataFrame:
    """Deterministic T5-style noise-span layout (Raffel et al. 2020
    §3.1.4 span corruption — the encoder-decoder twin of the FIM
    split): per document, which token positions a span-corruption
    objective would mask, as one report row (``id_col``, n_tokens,
    n_spans, n_masked, masked_frac).

    Laws (identical in the SQL oracle — no RNG, the hash ladder):
    - a span STARTS at position p iff hash_unit(id:p) < ``p_start``;
    - its length is 1 + floor(hash_unit(id:p:L) · ``max_span``),
      clipped at the document end;
    - overlapping or adjacent spans MERGE (exact interval union via
      gaps-and-islands: a new island opens when p exceeds the running
      max of previous span ends) — T5 replaces each merged region
      with ONE sentinel, so n_spans counts islands, n_masked sums
      island widths.

    Shape: positions come from exploding sequence(0, n−1) (the token
    STRINGS never leave the scan — only the count rides along), span
    starts keep ~p_start of positions, and the island windows
    partition by document — per-doc state only, 100 TB parallelism is
    document-granular. Documents with no tokens or no drawn spans
    report zeros."""
    from pyspark.sql import Window

    from tidyvec_spark.functions.text import tokens
    from tidyvec_spark.operators.sampling import hash_unit

    if not (0.0 < float(p_start) <= 1.0):
        raise ValueError(f"p_start must be in (0, 1], got {p_start}")
    if int(max_span) < 1:
        raise ValueError(f"max_span must be >= 1, got {max_span}")
    base = df.select(
        F.col(id_col), F.size(tokens(text_col)).alias("n")
    )
    pos = base.filter(F.col("n") > 0).select(
        id_col,
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("p"),
    )
    key = F.concat(
        F.col(id_col).cast("string"), F.lit(":"),
        F.col("p").cast("string"),
    )
    u_start = hash_unit(key, salt)
    u_len = hash_unit(F.concat(key, F.lit(":L")), salt)
    spans = pos.filter(u_start < float(p_start)).select(
        id_col,
        "p",
        F.least(
            F.col("p")
            + 1
            + F.floor(u_len * int(max_span)).cast("long"),
            F.col("n"),
        ).alias("e"),
    )
    w = Window.partitionBy(id_col).orderBy("p")
    prev_max_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn(
        "__f",
        F.when(
            prev_max_end.isNull() | (F.col("p") > prev_max_end), 1
        ).otherwise(0),
    ).withColumn("__s", F.sum("__f").over(w))
    islands = flagged.groupBy(id_col, "__s").agg(
        F.min("p").alias("lo"), F.max("e").alias("hi")
    )
    agg = islands.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.col("hi") - F.col("lo")).cast("long").alias("n_masked"),
    )
    frac = F.when(
        F.col("n") > 0,
        F.coalesce(F.col("n_masked"), F.lit(0)).cast("double")
        / F.col("n").cast("double"),
    ).otherwise(F.lit(0.0))
    if round_to is not None:
        frac = F.round(frac, int(round_to))
    return base.join(agg, id_col, "left").select(
        id_col,
        F.col("n").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias(
            "n_spans"
        ),
        F.coalesce(F.col("n_masked"), F.lit(0)).cast("long").alias(
            "n_masked"
        ),
        frac.alias("masked_frac"),
    )
