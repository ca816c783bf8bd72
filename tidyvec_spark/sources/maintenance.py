"""Table maintenance: small-file compaction.

Streaming ingest (micro-batch sinks, per-trigger files) and
fine-grained partitioned writes leave a 100 TB table as millions of
KB-sized files — every subsequent scan then pays per-file open/footer
costs that dwarf the data read, and the driver pays listing time.
Compaction rewrites a prefix into ~``target_mb`` files; run it on cold
partitions behind the ingest watermark (the classic
landing-zone-then-compact layout; table formats like Delta/Iceberg
bake this in as OPTIMIZE — this is the plain-parquet equivalent).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "compact_parquet",
    "corpus_manifest",
    "merge_upsert",
    "parquet_file_stats",
    "read_training_shard",
    "scd2_history",
    "snapshot_asof",
    "write_training_shards",
]


def parquet_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) for the parquet data files under ``path``.

    Lists through the Hadoop FileSystem API so the same code works on
    every scheme Spark can read (``file:``, ``hdfs:``, ``s3a:``,
    ``abfs:``, ...) — a local ``os.walk`` silently returns 0 files on
    object-store paths, which is exactly where compaction matters.
    The listing is a single recursive ``listFiles`` call (one LIST
    round-trip per S3 page, not one stat per file).
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    n, total = 0, 0
    it = fs.listFiles(jpath, True)  # recursive
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            n += 1
            total += st.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 128,
    partition_by: str | None = None,
    mode: str = "errorifexists",
) -> int:
    """Rewrite ``src``'s parquet as ~``target_mb``-sized files at
    ``dst``; returns the output file-count target.

    Sizing uses the actual on-disk bytes (compressed), so the output
    count is ``ceil(bytes / target)`` — no sampling pass. The rewrite
    is one scan + one round-robin repartition (a shuffle, paid once to
    fix every future scan). With ``partition_by`` the directory layout
    is preserved/established and files coalesce within partitions via
    the repartition count.

    Raises if the listing finds no parquet files — compacting an empty
    or mis-pointed path into one file is a sizing failure, not a no-op.

    Atomicity note: writes to a NEW location (object-store rename is
    not atomic); swap the table pointer after success, as any
    plain-parquet compactor must.
    """
    n_files, total = parquet_file_stats(spark, src)
    if n_files == 0:
        raise ValueError(f"no parquet data files found under {src!r}")
    n_out = max(1, math.ceil(total / (int(target_mb) * 1024 * 1024)))
    df: DataFrame = spark.read.parquet(src)
    w = df.repartition(n_out)
    writer = w.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(dst)
    return n_out


def _manifest_digest(F):
    return F.md5(
        F.concat_ws(
            ":",
            F.col("h_xor").cast("string"),
            F.col("h_sum").cast("decimal(38,0)").cast("string"),
        )
    ).alias("content_hash")


def corpus_manifest(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int = 16,
    digest: bool = True,
    sketch: bool = False,
    lg_k: int = 14,
    cms: bool = False,
    cms_depth: int = 4,
    cms_width: int = 256,
    cms_salt: str = "",
    minhash: bool = False,
    mh_k: int = 64,
    bloom: bool = False,
    bloom_bits: int = 1 << 16,
    bloom_k: int = 4,
    bloom_salt: str = "",
    lenhist: bool = False,
    lenhist_edges: tuple = (0, 8, 16, 32, 64, 128, 256, 512,
                            1024, 4096, 16384, 65536),
) -> DataFrame:
    """Content-addressable corpus manifest: per deterministic shard,
    (shard, n_docs, n_tokens, content_hash) — the artifact that makes
    a 100 TB corpus VERIFIABLE: re-run the manifest after any copy /
    engine migration / compaction and byte-diff the tiny result
    instead of the petabytes. Two builds of "the same" corpus agree
    iff every shard hash agrees, and a mismatch localizes to 1/n of
    the data.

    Determinism: shard = md5(id) mod n (engine-portable, layout-
    independent); content_hash is an order-insensitive STREAMING fold
    of the per-doc 60-bit content hashes — xor (catches any content
    change) combined with an exact decimal sum (catches multiplicity
    changes xor alone would cancel), digested to one md5. Constant
    aggregation-buffer memory per shard: no collected array, so shard
    count is a locality knob, not an OOM bound. One explode-free pass
    + one shard-sized agg, partial-aggregated map-side.

    With ``digest=False`` the raw folds come back as columns
    (shard, n_docs, n_tokens, h_xor, h_sum) instead of the md5 digest
    — the form :func:`combine_manifests` can merge, because xor and
    sum are associative and commutative.

    With ``sketch=True`` each shard row also carries the HLL sketch
    (binary, a few KB) of the per-doc 60-bit CONTENT hashes — stored
    at ingest, these answer cross-corpus overlap triage
    (:func:`~tidyvec_spark.operators.sketches.hll_overlap_from_sketches`)
    with ZERO corpus scans, because sketch union is lossless: folding
    the shard sketches reproduces the estimates of sketching the
    corpus directly.
    ``hll_union_agg`` is associative/commutative like the other folds,
    so :func:`combine_manifests` extends naturally and incremental
    maintenance is unchanged.

    With ``cms=True`` each shard row also carries the shard's
    Count-Min sketch of its TOKEN stream as a flat
    ``cms_depth·cms_width`` count array (index r·width + bucket; 4×256
    longs = 8 KB/shard) — the counting twin of the HLL column: stored
    at ingest, the summed shard arrays reproduce the whole-corpus CMS
    EXACTLY (counter addition is the merge law, no estimation error in
    the merge itself), so cross-corpus frequency / heavy-hitter triage
    (:func:`~tidyvec_spark.operators.sketches.cms_from_manifest` →
    ``cms_estimate``) runs with ZERO corpus scans. The bucket law is
    :func:`~tidyvec_spark.operators.sketches.cms_build`'s
    engine-portable md5 idiom, so any engine's manifest probes
    identically. Token counting is a different grain than the per-doc
    folds (an explode), so ``cms=True`` costs a second pass over the
    text — paid once at ingest, saved on every later triage query.

    With ``minhash=True`` each shard row also carries the
    k-permutation MinHash signature of the shard's CONTENT-hash set
    (Broder 1997; the Carter–Wegman family hashing.py::minhash_coeffs
    — the same literals the near-dup operators embed), completing the
    stored-sketch triad: HLL answers DISTINCT triage, CMS answers
    FREQUENCY, MinHash answers SIMILARITY (cross-corpus Jaccard =
    matching-minima/k via
    :func:`~tidyvec_spark.operators.sketches.minhash_jaccard_from_manifests`,
    zero corpus scans). Component-wise min is the union law, so
    :func:`combine_manifests` merges it exactly; the signature rides
    the SAME per-doc aggregate as the count/hash folds — no extra
    pass, unlike the token-grain CMS.

    With ``bloom=True`` each shard row also carries a Bloom bitmap of
    the shard's TOKEN stream as ``bloom_bits/64`` packed longs
    (2^16 bits · k=4 = 8 KB/shard by default) — the MEMBERSHIP member
    of the stored-sketch family, completing the triage quartet
    (HLL → distinct, CMS → frequency, MinHash → similarity,
    Bloom → membership): "is this contaminated n-gram probably in
    corpus A?" answered with ZERO corpus scans via
    :func:`~tidyvec_spark.operators.sketches.bloom_from_manifest` →
    ``bloom_member_probe``. Bitwise OR is the union law (Bloom 1970 —
    set-bit union of disjoint streams is exact, so the folded bitmap
    equals the whole-corpus build bit-for-bit and NEVER false-negates;
    only the false-positive rate degrades as the union fills), so
    :func:`combine_manifests` extends with a sixth fold. The k probe
    positions use the same engine-portable md5 idiom as the CMS bucket
    law (``_cms_bucket`` with width = ``bloom_bits``), so any engine's
    manifest probes identically. Token grain, like CMS — a second text
    pass paid once at ingest.

    With ``lenhist=True`` each shard row also carries the shard's
    DOCUMENT-LENGTH histogram over the fixed integer
    ``lenhist_edges`` (k edges → k+1 buckets; bucket = Σ [n_tokens >
    edge], the psi_drift binning law — integer comparisons, so any
    engine buckets identically) — the DISTRIBUTION member of the
    stored-sketch family: "did this corpus's length profile shift?"
    and "which length bucket holds the p90?" answered with ZERO
    corpus scans, off counts that fold by ELEMENT-WISE ADDITION
    (exact, like CMS) in :func:`combine_manifests`. FIXED edges are
    what make histograms comparable across corpora and releases (the
    psi_drift argument); the column rides the SAME per-doc aggregate
    as the count/hash folds — no extra pass.
    """
    from pyspark.sql import functions as F

    from tidyvec_spark.functions.hashing import md5_long
    from tidyvec_spark.functions.text import token_count

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    per_doc = df.select(
        F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(int(n_shards)))
        .cast("int")
        .alias("shard"),
        md5_long(F.col(text_col)).alias("__h"),
        token_count(text_col).alias("__nt"),
    )
    aggs = [
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__nt").cast("long").alias("n_tokens"),
        F.bit_xor("__h").alias("h_xor"),
        # decimal(38,0) sums ~10^19 60-bit terms exactly —
        # no bigint overflow, order-independent
        F.sum(F.col("__h").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("h_sum"),
    ]
    if sketch:
        aggs.append(
            F.hll_sketch_agg(F.col("__h"), F.lit(int(lg_k))).alias("sketch")
        )
    if lenhist:
        edges = [int(e) for e in lenhist_edges]
        if edges != sorted(set(edges)):
            raise ValueError("lenhist_edges must be strictly increasing")
        bucket = None
        for e in edges:
            step = F.when(F.col("__nt") > e, 1).otherwise(0)
            bucket = step if bucket is None else bucket + step
        aggs.append(
            F.array(
                *[
                    F.sum(
                        F.when(bucket == i, F.lit(1)).otherwise(F.lit(0))
                    ).cast("long")
                    for i in range(len(edges) + 1)
                ]
            ).alias("lenhist")
        )
    if minhash:
        from tidyvec_spark.functions.hashing import (
            MINHASH_MASK,
            MINHASH_P,
            minhash_coeffs,
        )

        if int(mh_k) < 1:
            raise ValueError("mh_k must be >= 1")
        hb = F.col("__h").bitwiseAND(F.lit(MINHASH_MASK))
        aggs.append(
            F.array(
                *[
                    F.min((F.lit(a) * hb + F.lit(b)) % F.lit(MINHASH_P))
                    for a, b in minhash_coeffs(int(mh_k))
                ]
            ).alias("minhash")
        )
    raw = per_doc.groupBy("shard").agg(*aggs)
    if cms:
        raw = raw.join(
            _shard_token_cms(
                df, id_col, text_col, int(n_shards),
                int(cms_depth), int(cms_width), cms_salt,
            ),
            "shard",
            "left",
        ).withColumn(
            "cms",
            F.coalesce(
                F.col("cms"),
                F.array_repeat(
                    F.lit(0).cast("long"),
                    int(cms_depth) * int(cms_width),
                ),
            ),
        )
    if bloom:
        raw = raw.join(
            _shard_token_bloom(
                df, id_col, text_col, int(n_shards),
                int(bloom_bits), int(bloom_k), bloom_salt,
            ),
            "shard",
            "left",
        ).withColumn(
            "bloom",
            F.coalesce(
                F.col("bloom"),
                F.array_repeat(
                    F.lit(0).cast("long"), int(bloom_bits) // 64
                ),
            ),
        )
    if not digest:
        return raw
    cols = ["shard", "n_docs", "n_tokens", _manifest_digest(F)]
    if sketch:
        cols.append("sketch")
    if cms:
        cols.append("cms")
    if minhash:
        cols.append("minhash")
    if bloom:
        cols.append("bloom")
    if lenhist:
        cols.append("lenhist")
    return raw.select(*cols)


def _shard_token_cms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int,
    depth: int,
    width: int,
    salt: str,
) -> DataFrame:
    """Per-shard token Count-Min counts as one flat array per shard
    (index r·width + bucket) — :func:`corpus_manifest`'s cms column.
    One token-grain pass: explode tokens × depth rows, count per
    (shard, r, bucket) with full map-side partial aggregation (output
    bounded by n_shards·depth·width rows), then assemble each shard's
    ≤ depth·width observed counters into the dense array via a
    bounded collect_list — never a per-token collect."""
    from pyspark.sql import functions as F

    from tidyvec_spark.functions.hashing import md5_long
    from tidyvec_spark.functions.text import tokens
    from tidyvec_spark.operators.sketches import _cms_bucket

    if depth < 1 or width < 1:
        raise ValueError("cms_depth and cms_width must be >= 1")
    tok = df.select(
        F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.explode(tokens(text_col)).alias("__v"),
    )
    counts = (
        tok.select(
            "shard",
            "__v",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
        )
        .withColumn("bucket", _cms_bucket(width, salt))
        .groupBy("shard", "r", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    entries = F.map_from_entries(
        F.collect_list(
            F.struct(
                (F.col("r") * width + F.col("bucket"))
                .cast("int")
                .alias("k"),
                F.col("cnt").alias("v"),
            )
        )
    )
    return counts.groupBy("shard").agg(entries.alias("__m")).select(
        "shard",
        F.transform(
            F.sequence(F.lit(0), F.lit(depth * width - 1)),
            lambda i: F.coalesce(
                F.try_element_at(F.col("__m"), i.cast("int")),
                F.lit(0).cast("long"),
            ),
        ).alias("cms"),
    )


def _shard_token_bloom(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int,
    num_bits: int,
    k: int,
    salt: str,
) -> DataFrame:
    """Per-shard token Bloom bitmap as ``num_bits/64`` packed longs —
    :func:`corpus_manifest`'s bloom column. One token-grain pass:
    explode tokens × k probe rows, set-bit positions via the SAME
    engine-portable md5 law as the CMS bucket (``_cms_bucket`` with
    width = ``num_bits``), ``bit_or``-fold per (shard, word) with full
    map-side partial aggregation (output bounded by
    n_shards · num_bits/64 rows), then assemble each shard's observed
    words into the dense array via a bounded collect_list — never a
    per-token collect (the ``bloom_bitmap_words`` shape from
    operators/bloom.py, densified per shard for storage)."""
    from pyspark.sql import functions as F

    from tidyvec_spark.functions.hashing import md5_long
    from tidyvec_spark.functions.text import tokens
    from tidyvec_spark.operators.sketches import _cms_bucket

    if num_bits < 64 or num_bits % 64 != 0:
        raise ValueError("bloom_bits must be a positive multiple of 64")
    if k < 1:
        raise ValueError("bloom_k must be >= 1")
    n_words = num_bits // 64
    tok = df.select(
        F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.explode(tokens(text_col)).alias("__v"),
    )
    words = (
        tok.select(
            "shard",
            "__v",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("r"),
        )
        .withColumn("__p", _cms_bucket(num_bits, salt))
        .select(
            "shard",
            F.expr("__p DIV 64").cast("int").alias("__wi"),
            F.expr("shiftleft(1L, cast(__p % 64 AS int))").alias("__m"),
        )
        .groupBy("shard", "__wi")
        .agg(F.bit_or("__m").alias("__w"))
    )
    entries = F.map_from_entries(
        F.collect_list(
            F.struct(F.col("__wi").alias("k"), F.col("__w").alias("v"))
        )
    )
    return words.groupBy("shard").agg(entries.alias("__m")).select(
        "shard",
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.try_element_at(F.col("__m"), i.cast("int")),
                F.lit(0).cast("long"),
            ),
        ).alias("bloom"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    n_shards: int = 64,
) -> None:
    """Deterministic sharded training export: shard =
    md5(id) mod ``n_shards`` — the :func:`corpus_manifest` law, so
    shard ASSIGNMENT is a pure function of the id, independent of
    input partitioning, engine, or layout — written as parquet
    partitioned by ``shard`` under ``<path>/data`` with the digest
    manifest alongside at ``<path>/_manifest``.

    This is the corpus→dataloader handoff: a trainer ranks over
    ``n_shards`` directories (fetch shard i = one directory listing,
    no scan), re-exports of the same corpus land every document in
    the same shard (incremental syncs diff per-shard), and the
    manifest verifies any copy without re-reading the data
    (re-run :func:`corpus_manifest` on the destination and byte-diff
    ~n_shards rows). md5 sharding also makes shard sizes even by
    construction — no planning pass, no skewed shard."""
    from pyspark.sql import functions as F

    from tidyvec_spark.functions.hashing import md5_long

    if int(n_shards) < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard = (
        F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(int(n_shards)))
        .cast("int")
        .alias("shard")
    )
    df.withColumn("shard", shard).write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(f"{path}/data")
    corpus_manifest(
        df, id_col, text_col, n_shards=int(n_shards)
    ).write.mode("overwrite").parquet(f"{path}/_manifest")


def read_training_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard of a :func:`write_training_shards` export — the
    filter is on the partition column, so the scan lists exactly one
    directory (PartitionFilters, pinned in tests), never the corpus."""
    from pyspark.sql import functions as F

    return spark.read.parquet(f"{path}/data").filter(
        F.col("shard") == int(shard)
    )


def combine_manifests(*parts: DataFrame) -> DataFrame:
    """Merge raw (``digest=False``) manifests of DISJOINT corpus parts
    into the digested full-corpus manifest — the INCREMENTAL ingest
    path: a petabyte corpus's manifest updates from just the arriving
    batch's manifest, never a recompute, because both folds are
    associative and commutative (xor of xors, sum of sums). The merged
    digest is bit-identical to running :func:`corpus_manifest` over
    the union of the parts.

    Parts built with ``sketch=True`` merge their per-shard HLL
    binaries via lossless sketch union (``hll_union_agg`` is the
    fourth associative/commutative fold), so the merged manifest's
    sketch equals the whole-corpus sketch — incremental ingest keeps
    the zero-scan overlap-triage capability. All parts must agree on
    having (or not having) the sketch column.

    Parts built with ``cms=True`` merge their per-shard Count-Min
    arrays by ELEMENT-WISE ADDITION (the fifth fold — CMS counters of
    disjoint streams sum exactly, Cormode & Muthukrishnan 2005), so
    the merged manifest's cms equals the whole-corpus build
    bit-for-bit and zero-scan frequency triage survives incremental
    ingest. Same all-or-none column rule as the HLL sketch; all parts
    must share (depth, width, salt).
    """
    from functools import reduce

    from pyspark.sql import functions as F

    if not parts:
        raise ValueError("need at least one manifest part")
    with_sketch = ["sketch" in p.columns for p in parts]
    if any(with_sketch) and not all(with_sketch):
        raise ValueError(
            "cannot merge sketchless and sketch-bearing manifest parts: "
            "the merged sketch would silently under-count the sketchless "
            "part; rebuild it with corpus_manifest(..., sketch=True)"
        )
    with_cms = ["cms" in p.columns for p in parts]
    if any(with_cms) and not all(with_cms):
        raise ValueError(
            "cannot merge cms-less and cms-bearing manifest parts: "
            "the merged cms would silently under-count the cms-less "
            "part; rebuild it with corpus_manifest(..., cms=True)"
        )
    with_mh = ["minhash" in p.columns for p in parts]
    if any(with_mh) and not all(with_mh):
        raise ValueError(
            "cannot merge minhash-less and minhash-bearing manifest "
            "parts: the merged minhash would silently ignore the "
            "minhash-less part; rebuild it with "
            "corpus_manifest(..., minhash=True)"
        )
    with_lh = ["lenhist" in p.columns for p in parts]
    if any(with_lh) and not all(with_lh):
        raise ValueError(
            "cannot merge lenhist-less and lenhist-bearing manifest "
            "parts: the merged histogram would silently under-count "
            "the lenhist-less part; rebuild it with "
            "corpus_manifest(..., lenhist=True)"
        )
    with_bloom = ["bloom" in p.columns for p in parts]
    if any(with_bloom) and not all(with_bloom):
        raise ValueError(
            "cannot merge bloom-less and bloom-bearing manifest "
            "parts: the merged bloom would silently false-negate on "
            "the bloom-less part; rebuild it with "
            "corpus_manifest(..., bloom=True)"
        )
    u = reduce(lambda a, b: a.unionByName(b), parts)
    aggs = [
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.bit_xor("h_xor").alias("h_xor"),
        F.sum("h_sum").cast("decimal(38,0)").alias("h_sum"),
    ]
    cols = ["shard", "n_docs", "n_tokens", _manifest_digest(F)]
    if all(with_sketch):
        aggs.append(F.hll_union_agg(F.col("sketch"), F.lit(True)).alias("sketch"))
        cols.append("sketch")
    if all(with_cms):
        # per-shard list is parts-sized (bounded); fold by zip_with sum
        lst = F.collect_list("cms")
        aggs.append(
            F.aggregate(
                F.slice(
                    lst, F.lit(2), F.greatest(F.size(lst) - 1, F.lit(0))
                ),
                F.element_at(lst, 1),
                lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
            ).alias("cms")
        )
        cols.append("cms")
    if all(with_mh):
        # component-wise min is the MinHash union law (Broder 1997)
        mlst = F.collect_list("minhash")
        aggs.append(
            F.aggregate(
                F.slice(
                    mlst, F.lit(2), F.greatest(F.size(mlst) - 1, F.lit(0))
                ),
                F.element_at(mlst, 1),
                lambda acc, x: F.zip_with(acc, x, lambda p, q: F.least(p, q)),
            ).alias("minhash")
        )
        cols.append("minhash")
    if all(with_lh):
        # element-wise addition: histogram counts of disjoint corpora
        # sum exactly (the CMS merge law over length buckets)
        hlst = F.collect_list("lenhist")
        aggs.append(
            F.aggregate(
                F.slice(
                    hlst, F.lit(2), F.greatest(F.size(hlst) - 1, F.lit(0))
                ),
                F.element_at(hlst, 1),
                lambda acc, x: F.zip_with(acc, x, lambda p, q: p + q),
            ).alias("lenhist")
        )
        cols.append("lenhist")
    if all(with_bloom):
        # bitwise OR of set bits is the Bloom union law (Bloom 1970) —
        # exact, so never-false-negative survives the merge
        blst = F.collect_list("bloom")
        aggs.append(
            F.aggregate(
                F.slice(
                    blst, F.lit(2), F.greatest(F.size(blst) - 1, F.lit(0))
                ),
                F.element_at(blst, 1),
                lambda acc, x: F.zip_with(
                    acc, x, lambda p, q: p.bitwiseOR(q)
                ),
            ).alias("bloom")
        )
        cols.append("bloom")
    merged = u.groupBy("shard").agg(*aggs)
    return merged.select(*cols)


def manifest_stream(
    stream_df: DataFrame,
    parts_dir: str,
    checkpoint_dir: str,
    id_col: str,
    text_col: str,
    n_shards: int = 16,
    sketch: bool = False,
    cms: bool = False,
    **kwargs,
) -> None:
    """Maintain the corpus manifest AT INGEST: every streaming
    micro-batch appends its RAW (``digest=False``) manifest part to
    ``parts_dir`` via ``foreachBatch`` — so the manifest (and its HLL /
    Count-Min sketches, when enabled) is a free by-product of the
    ingest stream, and :func:`manifest_from_parts` folds the parts
    into the exact whole-corpus manifest WITHOUT ever re-scanning the
    ingested data (every fold is associative and commutative). This is
    the streaming form of the :func:`combine_manifests` incremental
    path; ``availableNow`` drains current input.

    ``foreachBatch`` is only at-least-once: if the job commits but the
    checkpoint does not (a crash in between), the batch REPLAYS on
    restart. A plain append would then double-count that batch's
    n_docs/n_tokens and double its HLL/CMS contributions in the fold.
    So each batch writes its part under ``parts_dir/batch_id=<bid>``
    with DYNAMIC partition overwrite — a replay overwrites its own
    partition instead of appending a duplicate, making the write
    idempotent and the end-to-end pipeline effectively exactly-once.

    **Migrating a pre-partitioned ``parts_dir``:** earlier versions
    appended part files at the ``parts_dir`` ROOT (no ``batch_id=``
    directories). A directory holding BOTH root files and partition
    directories is not readable as one consistent dataset by Spark,
    so restarting an old stream against its old ``parts_dir`` is not
    supported: either start a fresh ``parts_dir`` (and a fresh
    checkpoint), or move each legacy part file into its own
    ``batch_id=<n>/`` subdirectory (any distinct non-colliding ``n``
    below the stream's next batch id preserves the fold — batch_id is
    dropped before :func:`manifest_from_parts` folds) before the
    first restart under this layout."""
    q = (
        stream_df.writeStream.foreachBatch(
            manifest_batch_writer(
                parts_dir, id_col, text_col, n_shards=n_shards,
                sketch=sketch, cms=cms, **kwargs,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def manifest_batch_writer(
    parts_dir: str,
    id_col: str,
    text_col: str,
    n_shards: int = 16,
    sketch: bool = False,
    cms: bool = False,
    **kwargs,
):
    """The :func:`manifest_stream` ``foreachBatch`` body, exposed so
    the replay law is directly testable: invoking the returned
    callable twice with the SAME batch id (the at-least-once crash
    replay) must leave the folded manifest unchanged — the replay
    overwrites its own ``batch_id=<bid>`` partition via dynamic
    partition overwrite instead of appending a duplicate part."""
    def _batch(bdf: DataFrame, bid: int) -> None:
        part = corpus_manifest(
            bdf, id_col, text_col, n_shards=n_shards,
            digest=False, sketch=sketch, cms=cms, **kwargs,
        )
        from pyspark.sql import functions as F

        (
            part.withColumn("batch_id", F.lit(int(bid)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(parts_dir)
        )

    return _batch


def manifest_from_parts(spark: SparkSession, parts_dir: str) -> DataFrame:
    """Fold a :func:`manifest_stream` parts directory into the
    digested whole-corpus manifest — a shard-row-sized merge
    (n_shards × n_batches raw rows in, n_shards digested rows out),
    bit-identical to a one-shot :func:`corpus_manifest` over
    everything the stream ingested."""
    raw = spark.read.parquet(parts_dir).drop("batch_id")
    return combine_manifests(raw)


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    id_col: str,
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Batch MERGE (the CDC-compaction half of the streaming
    ``upsert_latest_stream``): latest version per id across
    ``base ∪ changes`` wins; a winning tombstone (``delete_col`` true)
    drops the id. The plain-parquet equivalent of Delta/Iceberg
    ``MERGE INTO`` for the periodic "fold the change feed into the
    snapshot" job.

    Shape: one union (no shuffle), one groupBy(id) max-of-struct —
    partial aggregation map-side, so an id updated a million times in
    the feed contributes one partial row per input partition; ties on
    ``version_col`` resolve to the CHANGES side (the feed is newer by
    definition). One shuffle total, width = distinct ids. No window —
    a row_number formulation would serialize hot ids.
    """
    from pyspark.sql import functions as F

    if delete_col is None:
        delete_col = "__deleted"
        base = base.withColumn(delete_col, F.lit(False))
        changes = changes.withColumn(delete_col, F.lit(False))
    cols = base.columns
    if set(cols) != set(changes.columns):
        raise ValueError(
            f"base and changes schemas differ: {sorted(cols)} vs "
            f"{sorted(changes.columns)}"
        )
    payload = [c for c in cols if c != id_col]
    u = base.withColumn("__src", F.lit(0)).unionByName(
        changes.select(*cols).withColumn("__src", F.lit(1))
    )
    win = u.groupBy(id_col).agg(
        F.max(F.struct(version_col, "__src", *[p for p in payload if p != version_col])).alias("__w")
    )
    out = win.select(
        id_col, *[F.col(f"__w.{p}").alias(p) for p in payload]
    ).filter(~F.col(delete_col))
    return out.drop("__deleted") if delete_col == "__deleted" else out


def scd2_history(
    changes: DataFrame,
    id_col: str,
    version_col: str,
    payload_cols: "list[str]",
    delete_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change feed —
    (id, payload..., effective_from, effective_to, is_current), one
    row per DISTINCT payload run per id.

    :func:`merge_upsert` answers "what is true now"; SCD2 answers
    "what was true when" — the shape joins against fact tables as-of
    any timestamp (pair with ``operators.joins.asof_join`` on
    ``effective_from``). Semantics:

    - versions order each id's timeline; ``effective_to`` is the NEXT
      change's version (NULL = open interval);
    - consecutive versions with an UNCHANGED payload collapse into one
      interval (re-asserting a value is not a change);
    - a tombstone (``delete_col`` true) CLOSES the interval without
      opening one, so a deleted id has no current row; re-inserting
      later opens a fresh interval.

    Shape: one shuffle on the id (window partition); per-id sort cost
    is bounded by that id's change count. The payload-change test is a
    lag over the same window — no self-join, no second shuffle.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not payload_cols:
        raise ValueError("payload_cols must be non-empty")
    deleted = (
        F.col(delete_col) if delete_col else F.lit(False)
    ).cast("boolean")
    w = Window.partitionBy(id_col).orderBy(version_col)
    # change-run detection: a row STARTS a run when its (payload,
    # deleted) state differs from the previous version's state
    state = F.struct(
        *[F.col(p) for p in payload_cols], deleted.alias("__del")
    )
    runs = (
        changes.withColumn("__state", state)
        .withColumn("__prev", F.lag("__state").over(w))
        .filter(
            F.col("__prev").isNull()
            | (F.col("__state") != F.col("__prev"))
        )
    )
    # windows over the FILTERED run-starts: next run start closes this
    # interval; same partitioning, Catalyst keeps it one exchange
    w2 = Window.partitionBy(id_col).orderBy(version_col)
    out = (
        runs.withColumn("effective_to", F.lead(version_col).over(w2))
        .filter(~F.col("__state.__del"))  # tombstone rows only close
        .select(
            id_col,
            *payload_cols,
            F.col(version_col).alias("effective_from"),
            "effective_to",
            F.col("effective_to").isNull().alias("is_current"),
        )
    )
    return out


def snapshot_asof(
    history: "DataFrame",
    version,
    version_from: str = "effective_from",
    version_to: str = "effective_to",
):
    """Time-travel read over a Type-2 history: the rows valid AT
    ``version`` — ``effective_from <= v`` and (open interval OR
    ``v < effective_to``). Pairs with :func:`scd2_history`: the
    history is built once, then ANY past corpus state is one map-side
    filter over it — time travel costs a scan, never a replay of the
    change feed. Tombstoned ids fall out naturally (their last closed
    interval ends at the tombstone version).

    At 100 TB: partition the stored history by ``effective_to`` range
    (open intervals in their own partition) and this filter prunes to
    the intervals spanning ``v``.
    """
    from pyspark.sql import functions as F

    v = F.lit(version)
    return history.filter(
        (F.col(version_from) <= v)
        & (F.col(version_to).isNull() | (v < F.col(version_to)))
    )
