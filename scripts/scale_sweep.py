#!/usr/bin/env python
"""Scaling-curve measurement for the vector/dedup families.

The driver fixtures pin documents/embeddings at 500 rows, so BENCH
walls for those families are session-overhead-dominated and say
nothing about how the plans scale. This sweep generates synthetic
corpora at geometrically increasing sizes (deterministic — same seed
math every run), times the headline candidate-generation operators at
each size, and prints a wall-vs-size curve. The claim under test:
wall tracks input + emitted candidates (key-join plans), never
input^2 (all-pairs plans).

Usage:  python scripts/scale_sweep.py [--quick]
  --quick  halves the size ladder (CI-sized smoke)

Sizes are chosen so the largest point is ~100k docs / 200k vectors —
big enough that a quadratic term would dominate by 100x, small enough
to finish on local[32] in minutes. Results are printed as one JSON
line per (operator, size) plus a summary table for README curation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_WORDS = [
    "data", "spark", "query", "table", "join", "filter", "column", "row",
    "hash", "merge", "window", "agg", "sort", "scan", "batch", "stream",
    "key", "value", "line", "part", "order", "group", "index", "cache",
    "shuffle", "plan", "stage", "task", "node", "disk", "memory", "byte",
]


def synth_docs(spark, n_docs: int, dup_frac: float = 0.1, doc_len: int = 60):
    """Deterministic synthetic corpus: ``n_docs`` docs of ``doc_len``
    words drawn by a hash mix, plus ``dup_frac`` near-duplicate copies
    (last 5 words changed) so the dedup operators emit real pairs at
    every size."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(doc_len - 1)),
                lambda i: F.element_at(
                    F.array(*[F.lit(w) for w in _WORDS]),
                    (
                        F.pmod(
                            F.xxhash64(F.col("id") * F.lit(doc_len) + i),
                            F.lit(len(_WORDS)),
                        )
                    ).cast("int")
                    + 1,
                ),
            ),
        ).alias("text"),
    )
    n_dup = int(n_docs * dup_frac)
    dups = base.filter(F.col("doc_id") < n_dup).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.substring_index(F.col("text"), " ", doc_len - 5),
            F.lit(" altered tail words go here"),
        ).alias("text"),
    )
    return base.unionByName(dups)


def synth_embeddings(spark, n_vecs: int, dim: int = 64, dup_frac: float = 0.05):
    """Deterministic pseudo-random unit-ish vectors + perturbed
    near-duplicates."""
    from pyspark.sql import functions as F

    base = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(
                    F.xxhash64(F.col("id") * F.lit(dim) + i), F.lit(2000)
                ).cast("double")
                - F.lit(1000.0)
            )
            / F.lit(1000.0),
        ).alias("embedding"),
    )
    n_dup = int(n_vecs * dup_frac)
    dups = base.filter(F.col("vec_id") < n_dup).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.01)),
            F.slice("embedding", 2, dim - 1),
        ).alias("embedding"),
    )
    return base.unionByName(dups)


def synth_skewed_embeddings(spark, n_vecs: int, dim: int = 64,
                            hot_frac: float = 0.5, n_blobs: int = 8,
                            dup_frac: float = 0.05):
    """Skewed cluster profile for the SemDeDup tiling sweep: half the
    corpus lands in ONE blob (the near-dup-farm regime the operator
    exists for — the hot centroid makes the hot GEMM tile), the rest
    spreads over the other blobs. Per-dim noise is ±0.1 so ORDINARY
    same-blob pairs sit well below a 0.99 threshold (the pair OUTPUT
    must stay linear — a corpus where every same-cluster pair matches
    measures Arrow row emission, not the tile decomposition); true
    near-dups are injected as explicit twins of ``dup_frac`` of the
    ids. Returns (vectors, centroids)."""
    from pyspark.sql import functions as F

    def blob_center(b):
        # deterministic well-separated centers: one-hot-ish direction
        return [1.0 if i == b * (dim // n_blobs) else 0.05
                for i in range(dim)]

    hot = int(n_vecs * hot_frac)
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_blobs - 1)) + 1)
        .cast("int")
        .alias("__b"),
    )
    centers = spark.createDataFrame(
        [(b, blob_center(b)) for b in range(n_blobs)],
        "centroid_id INT, centroid ARRAY<DOUBLE>",
    )
    base = vecs.join(F.broadcast(centers),
                     vecs["__b"] == centers["centroid_id"]).select(
        "vec_id",
        F.transform(
            F.col("centroid"),
            lambda v, i: v + (
                F.pmod(F.xxhash64(F.col("vec_id") * F.lit(dim) + i),
                       F.lit(200)).cast("double") - F.lit(100.0)
            ) / F.lit(1_000.0),
        ).alias("embedding"),
    )
    n_dup = int(n_vecs * dup_frac)
    twins = base.filter(F.col("vec_id") < n_dup).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.001)),
            F.slice("embedding", 2, dim - 1),
        ).alias("embedding"),
    )
    return base.unionByName(twins), centers


def synth_bmps(spark, n_docs: int):
    """Deterministic synthetic image corpus: complete 8x8 24-bpp BMPs
    assembled expression-side, 5 one-pixel-brightened variants per
    group (id div 5). Pixels are xxhash64-seeded so DISTINCT groups
    are iid-random in hash space — the oracle entry's arithmetic law
    is fine at 500 fixture rows but concentrates at 10^4+ groups and
    would emit quadratically many TRUE pairs, turning the sweep into
    an output-volume measurement instead of a linearity check. Every
    group still contributes exactly C(5,2) true near-dup pairs."""
    from pyspark.sql import functions as F

    v = (
        "(pmod(xxhash64((doc_id div 5) * 64 + IDX), 256)"
        " + IF(IDX = doc_id % 5, 128, 0)) % 256"
    )
    payload = F.expr(
        "array_join(transform(sequence(0, 191), j -> lpad(hex("
        + v.replace("IDX", "((7 - (j div 3) div 8) * 8 + (j div 3) % 8)")
        + "), 2, '0')), '')"
    )
    content = F.unhex(
        F.concat(
            F.lit("424DF60000000000000036000000"),
            F.lit("28000000080000000800000001001800"),
            F.lit("00000000C0000000"),
            F.lit("00" * 16),
            payload,
        )
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), content.alias("content")
    )


def synth_wavs(spark, n_docs: int):
    """Deterministic synthetic audio corpus: 128-sample mono PCM16
    WAVs, 5 variants per group (id div 5) each boosting one 2-sample
    window; xxhash64-seeded samples keep distinct groups iid-random in
    envelope space (same rationale as :func:`synth_bmps`)."""
    from pyspark.sql import functions as F

    v = (
        "(pmod(xxhash64((doc_id div 5) * 128 + IDX), 30000)"
        " + IF(IDX div 2 = doc_id % 5, 2000, 0))"
    )
    payload = F.expr(
        "array_join(transform(sequence(0, 127), i -> concat("
        "lpad(hex(" + v.replace("IDX", "i") + " % 256), 2, '0'),"
        "lpad(hex(" + v.replace("IDX", "i") + " div 256), 2, '0')"
        ")), '')"
    )
    content = F.unhex(
        F.concat(
            F.lit("52494646"), F.lit("24010000"),
            F.lit("57415645666D742010000000"),
            F.lit("0100"), F.lit("0100"),
            F.lit("803E0000"), F.lit("007D0000"),
            F.lit("0200"), F.lit("1000"),
            F.lit("64617461"), F.lit("00010000"),
            payload,
        )
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), content.alias("content")
    )


def materialize(df) -> int:
    """Force FULL computation of every column (count() would let
    Catalyst prune the expensive rebuild/verify columns away) and
    return the row count."""
    df = df.cache()
    try:
        df.write.format("noop").mode("overwrite").save()
        return df.count()
    finally:
        df.unpersist()


def timed(name, size, fn):
    t0 = time.perf_counter()
    n_out = fn()
    wall = round(time.perf_counter() - t0, 2)
    print(json.dumps({"op": name, "size": size, "wall_s": wall, "rows_out": n_out}))
    return wall


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    quick = "--quick" in sys.argv
    doc_sizes = [5_000, 20_000, 100_000]
    vec_sizes = [20_000, 80_000, 200_000]
    if quick:
        doc_sizes = doc_sizes[:2]
        vec_sizes = vec_sizes[:2]

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("tidyvec_spark_scale_sweep")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tidyvec_spark.operators.ann import ann_lsh_topk, random_planes
    from tidyvec_spark.operators.bloom import decontaminate_bloom
    from tidyvec_spark.operators.dedup import (
        lsh_near_dup_pairs,
        minhash_lsh_pairs,
        substring_dedup_cut,
        substring_dup_spans,
        winnow_pairs,
    )

    results: dict[str, list[tuple[int, float]]] = {}

    def record(op, size, fn):
        results.setdefault(op, []).append((size, timed(op, size, fn)))

    # untimed warm-up at a tiny size: first execution pays one-time
    # Janino codegen compilation (bench.py measured 6-13 s for the
    # md5-fold kernels), which would otherwise land entirely on the
    # smallest sweep point and bend the curve the wrong way
    wdocs = synth_docs(spark, 500).persist()
    wvecs = synth_embeddings(spark, 500).persist()
    wq = [float((i * 37 % 19) - 9) / 9.0 for i in range(64)]
    wplanes = random_planes(64, nbits=4, seed=42)
    materialize(minhash_lsh_pairs(wdocs, "text", "doc_id", num_hashes=16,
                                  bands=4, shingle_n=3, threshold=0.5))
    materialize(substring_dup_spans(wdocs, "text", "doc_id", k=8))
    materialize(substring_dedup_cut(wdocs, "text", "doc_id", k=8))
    materialize(winnow_pairs(wdocs, "text", "doc_id", k=5, w=4,
                             min_shared=1))
    materialize(decontaminate_bloom(wdocs, wdocs.limit(100), "text",
                                    "doc_id", n=8))
    materialize(ann_lsh_topk(wvecs, "embedding", "vec_id", wq, k=10,
                             planes=wplanes, probe_hamming=1, method="cosine"))
    materialize(lsh_near_dup_pairs(wvecs, "embedding", "vec_id",
                                   planes=wplanes, threshold=0.999))
    wdocs.unpersist(); wvecs.unpersist()
    spark.catalog.clearCache()

    for n in doc_sizes:
        docs = synth_docs(spark, n).persist()
        docs.count()  # materialize input OUTSIDE the timed region
        record(
            "minhash_lsh_pairs", n,
            lambda: materialize(minhash_lsh_pairs(
                docs, "text", "doc_id", num_hashes=16, bands=4, shingle_n=3,
                threshold=0.5,
            )),
        )
        record(
            "substring_dup_spans", n,
            lambda: materialize(substring_dup_spans(docs, "text", "doc_id", k=8)),
        )
        record(
            "substring_dedup_cut", n,
            lambda: materialize(substring_dedup_cut(docs, "text", "doc_id", k=8)),
        )
        record(
            "winnow_pairs", n,
            lambda: materialize(winnow_pairs(
                docs, "text", "doc_id", k=5, w=4, min_shared=1,
            )),
        )
        # benchmark side fixed at 1000 docs (the first 1000 ids of the
        # same generator — guaranteed true contamination hits): the
        # curve isolates the corpus-side map cost of the bloom probes
        bench = synth_docs(spark, 1000, dup_frac=0.0).persist()
        bench.count()
        record(
            "decontaminate_bloom", n,
            lambda: materialize(decontaminate_bloom(
                docs, bench, "text", "doc_id", n=8,
            )),
        )
        bench.unpersist()
        docs.unpersist()

    for n in vec_sizes:
        # the LSH table must grow with the corpus: constant nbits means
        # bucket occupancy ~ n/2^nbits and the self-join candidate count
        # ~ n^2/2^nbits — quadratic. Scaling nbits to hold ~150 vectors
        # per bucket keeps candidates ~ linear in n; this is the
        # documented production knob (measured: fixed 8-bit planes gave
        # 7x wall on 4x data at 80k vectors, scaled planes are ~linear).
        import math as _m

        nbits = max(8, _m.ceil(_m.log2(n / 150)))
        planes = random_planes(64, nbits=nbits, seed=42)
        vecs = synth_embeddings(spark, n).persist()
        vecs.count()
        q = [float((i * 37 % 19) - 9) / 9.0 for i in range(64)]
        record(
            "ann_lsh_topk", n,
            lambda: materialize(ann_lsh_topk(
                vecs, "embedding", "vec_id", q, k=10, planes=planes,
                probe_hamming=1, method="cosine",
            )),
        )
        record(
            "lsh_near_dup_pairs", n,
            lambda: materialize(lsh_near_dup_pairs(
                vecs, "embedding", "vec_id", planes=planes, threshold=0.999
            )),
        )
        vecs.unpersist()

    # visual near-dup: decode + banding. Band WIDTH is the production
    # knob here exactly like nbits is for vector LSH: candidates ~
    # bands * n^2 / 2^band_bits. The default (bands=4 -> 16-bit bands,
    # complete to Hamming 3) stays linear while distinct fingerprints
    # << 2^16 per band-value; bands=8 (complete to Hamming 7) has only
    # 256 band values and goes QUADRATIC past ~10^4 distinct images —
    # measured below as image_near_dup_b8 at one mid size.
    from tidyvec_spark.operators.dedup import image_near_dup_pairs

    img_sizes = [5_000, 20_000, 80_000]
    if quick:
        img_sizes = img_sizes[:2]
    wimgs = synth_bmps(spark, 500).persist()
    materialize(image_near_dup_pairs(wimgs, "content", "doc_id"))
    wimgs.unpersist()
    for n in img_sizes:
        imgs = synth_bmps(spark, n).persist()
        imgs.count()
        record(
            "image_near_dup_pairs", n,
            lambda: materialize(image_near_dup_pairs(
                imgs, "content", "doc_id",
            )),
        )
        imgs.unpersist()
    # the occupancy cliff, one point: radius-7-complete 8-bit bands
    imgs = synth_bmps(spark, 20_000).persist()
    imgs.count()
    record(
        "image_near_dup_b8", 20_000,
        lambda: materialize(image_near_dup_pairs(
            imgs, "content", "doc_id", bands=8, max_hamming=6,
        )),
    )
    imgs.unpersist()

    # audio twin: same banding core, PCM16 decode in front
    from tidyvec_spark.operators.dedup import audio_near_dup_pairs

    waud = synth_wavs(spark, 500).persist()
    materialize(audio_near_dup_pairs(waud, "content", "doc_id",
                                     windows=64))
    waud.unpersist()
    for n in img_sizes:
        auds = synth_wavs(spark, n).persist()
        auds.count()
        record(
            "audio_near_dup_pairs", n,
            lambda: materialize(audio_near_dup_pairs(
                auds, "content", "doc_id", windows=64,
            )),
        )
        auds.unpersist()

    # --- round-7 families ------------------------------------------

    # full dedup ladder end-to-end: exact -> within-doc lines ->
    # global lines -> substring cut -> minhash keep-best, as ONE lazy
    # plan. The claim: the composite tracks the sum of its rungs
    # (every shuffle a bounded key-agg/equi-join), no cross-rung blowup.
    from tidyvec_spark.functions import text as X
    from tidyvec_spark.functions.quality import dedup_lines_within_expr
    from tidyvec_spark.operators.dedup import (
        dedup_lines_global,
        drop_exact_dups,
        drop_near_dups_keep_best,
        near_dup_groups,
        substring_dedup_cut,
    )

    def dedup_ladder(docs):
        lined = docs.select(
            "doc_id",
            F.replace(F.col("text"), F.lit(" scan "), F.lit("\n")).alias(
                "text"
            ),
        )
        ex = drop_exact_dups(lined, "text", "doc_id")
        wd = ex.select("doc_id", dedup_lines_within_expr("text").alias("text"))
        gl = dedup_lines_global(wd, "text", "doc_id").select("doc_id", "text")
        cut = substring_dedup_cut(gl, "text", "doc_id", k=8).select(
            "doc_id", "text"
        )
        scored = cut.withColumn("n_tokens", X.token_count("text").cast("long"))
        comps = near_dup_groups(
            scored, "text", "doc_id", num_hashes=16, bands=4, shingle_n=3,
            threshold=0.5,
        )
        return drop_near_dups_keep_best(scored, comps, "doc_id", "n_tokens")

    wl = synth_docs(spark, 500).persist()
    materialize(dedup_ladder(wl))
    wl.unpersist()
    for n in doc_sizes:
        docs = synth_docs(spark, n).persist()
        docs.count()
        record(
            "pipeline_dedup_full", n,
            lambda: materialize(dedup_ladder(docs)),
        )
        docs.unpersist()

    # near-dup GROUPING, both regimes: verified pairs are quadratic in
    # clique size (the dup-dense corpus forms real cliques), bucket-star
    # edges are O(n·bands) — the published large-scale MinHashLSH-dedup
    # behavior. Same corpus, same banding.
    from tidyvec_spark.operators.dedup import near_dup_groups
    from tidyvec_spark.operators.dedup import release as _rel

    wg = synth_docs(spark, 500).persist()
    materialize(near_dup_groups(wg, "text", "doc_id", method="bucket"))
    wg.unpersist()
    for n in doc_sizes:
        docs = synth_docs(spark, n).persist()
        docs.count()
        record(
            "dedup_groups_bucket", n,
            lambda: materialize(near_dup_groups(
                docs, "text", "doc_id", num_hashes=16, bands=4,
                shingle_n=3, method="bucket",
            )),
        )
        # the bridge-resistant twin: verified pairs + 4 LPA rounds —
        # pair cost dominates (same as verify); the grouping stage is
        # the PageRank recurrence shape
        if n <= doc_sizes[min(1, len(doc_sizes) - 1)]:

            def _lpa_run():
                out = near_dup_groups(
                    docs, "text", "doc_id", num_hashes=16, bands=4,
                    shingle_n=3, method="lpa",
                )
                r = materialize(out)
                _rel(out)
                return r

            record("dedup_groups_lpa", n, _lpa_run)
        docs.unpersist()

    # PageRank: 10 fixed-point iterations, nodes x 3 out-links. The
    # claim: wall ~ edges (per round one edge join + one groupBy-sum;
    # localCheckpoint bounds lineage, so 10 rounds cost 10 short jobs).
    from tidyvec_spark.operators.graph import pagerank, synthetic_link_graph

    pr_sizes = [10_000, 40_000, 160_000]
    if quick:
        pr_sizes = pr_sizes[:2]
    wn = spark.range(500).select(F.col("id").alias("doc_id")).persist()
    materialize(pagerank(synthetic_link_graph(wn, "doc_id"), iterations=10))
    wn.unpersist()
    for n in pr_sizes:
        nodes = spark.range(n).select(F.col("id").alias("doc_id")).persist()
        nodes.count()
        record(
            "pagerank_10it", n,
            lambda: materialize(
                pagerank(synthetic_link_graph(nodes, "doc_id"), iterations=10)
            ),
        )
        nodes.unpersist()

    # entity resolution: blocking join + bounded levenshtein verify.
    # BLOCK SIZE is the production knob (pair count = sum_b C(|b|,2)):
    # at fixed n, halving the number of blocks doubles mean block size
    # and ~doubles candidates — measured below as ent_res_blocks_<k>.
    from tidyvec_spark.operators.entities import entity_match_pairs

    def synth_entities(n, n_blocks):
        return spark.range(n).select(
            F.col("id"),
            F.pmod(F.xxhash64("id"), F.lit(n_blocks)).alias("blk"),
            F.concat(
                F.lit("entity name "),
                F.pmod(F.xxhash64(F.col("id") * 3), F.lit(max(n // 4, 1)))
                .cast("string"),
                # 20% get a 1-char tail perturbation so matches exist
                F.when(F.col("id") % 5 == 0, F.lit("x")).otherwise(F.lit("")),
            ).alias("name"),
        )
    we = synth_entities(500, 50).persist()
    materialize(entity_match_pairs(we, "id", "name", ["blk"], max_edit=2))
    we.unpersist()
    ent_sizes = [10_000, 40_000, 160_000]
    if quick:
        ent_sizes = ent_sizes[:2]
    for n in ent_sizes:
        ents = synth_entities(n, n // 20).persist()  # ~20 rows per block
        ents.count()
        record(
            "entity_match_pairs", n,
            lambda: materialize(
                entity_match_pairs(ents, "id", "name", ["blk"], max_edit=2)
            ),
        )
        ents.unpersist()
    # block-size sensitivity at fixed n: pairs ~ n * block_size
    n_fix = ent_sizes[-1]
    for per_block in (10, 40, 160):
        ents = synth_entities(n_fix, n_fix // per_block).persist()
        ents.count()
        record(
            f"ent_res_block_{per_block}", n_fix,
            lambda: materialize(
                entity_match_pairs(ents, "id", "name", ["blk"], max_edit=2)
            ),
        )
        ents.unpersist()

    # indexed BM25 vs full scan: the claim is that query wall against
    # the persisted index is ~flat in corpus size (scan ~ the query
    # terms' postings via bucket-directory + row-group pruning) while
    # the full scan grows ~linearly. The corpus here needs a REALISTIC
    # vocabulary (20k terms, each query term in ~0.3% of docs) — with
    # the 32-word synth_docs vocabulary every term is a stop word,
    # postings ~ the whole corpus, and pruning can't prune.
    import shutil
    import tempfile

    from tidyvec_spark.operators.index import (
        bm25_topk_indexed,
        write_inverted_index,
    )
    from tidyvec_spark.operators.search import bm25_topk

    def synth_docs_wide(n_docs, vocab=20_000, doc_len=60):
        return spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(doc_len - 1)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod(
                            F.xxhash64(F.col("id") * doc_len + i),
                            F.lit(vocab),
                        ).cast("string"),
                    ),
                ),
            ).alias("text"),
        )

    bm_query = "w17 w4242 w9999"
    # warm-up: first indexed query pays one-time codegen (~9 s measured)
    wix = tempfile.mkdtemp(prefix="sweep_ix_")
    try:
        wb = synth_docs_wide(2000).persist()
        materialize(bm25_topk(wb, "text", "doc_id", bm_query, n=10))
        write_inverted_index(wb, "text", "doc_id", wix, n_buckets=64)
        materialize(bm25_topk_indexed(spark, wix, bm_query, n=10))
        wb.unpersist()
    finally:
        shutil.rmtree(wix, ignore_errors=True)
    for n in doc_sizes:
        docs = synth_docs_wide(n).persist()
        docs.count()
        record(
            "bm25_full_scan", n,
            lambda: materialize(
                bm25_topk(docs, "text", "doc_id", bm_query, n=10)
            ),
        )
        ixdir = tempfile.mkdtemp(prefix="sweep_ix_")
        try:
            write_inverted_index(docs, "text", "doc_id", ixdir, n_buckets=64)
            record(
                "bm25_indexed_topk", n,
                lambda: materialize(
                    bm25_topk_indexed(spark, ixdir, bm_query, n=10)
                ),
            )
        finally:
            shutil.rmtree(ixdir, ignore_errors=True)
        docs.unpersist()

    # round-8 families: CDC chunking (map-side, expect linear),
    # n-gram novelty (inverted-index DF agg, linear in shingle
    # occurrences), fuzzy decontamination (corpus side grows, bench
    # fixed at 1000 — isolates the corpus-side cost like the bloom
    # curve above)
    from tidyvec_spark.operators.chunking import cdc_chunks
    from tidyvec_spark.operators.dedup import fuzzy_contamination_hits
    from tidyvec_spark.operators.reports import ngram_novelty

    w8 = synth_docs(spark, 500).persist()
    materialize(cdc_chunks(w8, "text", "doc_id"))
    materialize(ngram_novelty(w8, "text", "doc_id"))
    materialize(fuzzy_contamination_hits(w8, w8.limit(100), "text", "doc_id"))
    w8.unpersist()
    for n in doc_sizes:
        docs = synth_docs(spark, n).persist()
        docs.count()
        record(
            "cdc_chunks", n,
            lambda: materialize(cdc_chunks(docs, "text", "doc_id")),
        )
        record(
            "ngram_novelty", n,
            lambda: materialize(ngram_novelty(docs, "text", "doc_id")),
        )
        bench8 = synth_docs(spark, 1000, dup_frac=0.0).persist()
        bench8.count()
        record(
            "decontaminate_fuzzy", n,
            lambda: materialize(fuzzy_contamination_hits(
                docs, bench8, "text", "doc_id",
            )),
        )
        bench8.unpersist()
        docs.unpersist()

    # SemDeDup skewed-cluster tiling: half the corpus in ONE hot
    # cluster. The untiled kernel's hot task is |cluster|²·d — run it
    # only at the smallest size (8GB of similarity matrix at 80k); the
    # tiled default (per-cluster block count from the measured size)
    # bounds every task at ~2·tile_rows rows and should stay near-linear.
    from tidyvec_spark.operators.dedup import release as _release
    from tidyvec_spark.operators.semdedup import semantic_dedup_pairs

    def _run_semdedup(frame, cents, tile_rows):
        # the tiled path persists its assignment subtree (round-10
        # change) and rides the handle on the result — release it
        # after the terminal action or each timed point leaks one
        # cached assignment frame into the next
        pairs = semantic_dedup_pairs(
            frame, "embedding", "vec_id", cents,
            threshold=0.99, tile_rows=tile_rows,
        )
        n_out = materialize(pairs)
        _release(pairs)
        return n_out

    wsk, wskc = synth_skewed_embeddings(spark, 2000)
    wsk = wsk.persist(); wsk.count()
    _run_semdedup(wsk, wskc, 2048)
    wsk.unpersist()
    for n in vec_sizes:
        sk, skc = synth_skewed_embeddings(spark, n)
        sk = sk.persist(); sk.count()
        record(
            "semdedup_tiled", n,
            lambda: _run_semdedup(sk, skc, 2048),
        )
        if n == vec_sizes[0]:
            record(
                "semdedup_untiled", n,
                lambda: _run_semdedup(sk, skc, None),
            )
        sk.unpersist()

    # pipeline_ccnet A/B: the carry= seam (lang label rides the LM's
    # per-bigram shuffle) vs the old re-join plan (scored frame joined
    # back to its own derived input, recomputing the dedup + lang-id
    # subtree). Settles the r6→r8 fixture-wall drift question: if the
    # carry path is flat/below the re-join curve at 10×/20× fixture
    # scale, the drift was VM noise, not a plan regression.
    from tidyvec_spark.functions import text as X
    from tidyvec_spark.operators.dedup import dedup_lines_global
    from tidyvec_spark.operators.lm import (
        bigram_lm_perplexity,
        perplexity_buckets,
    )

    def ccnet(docs, use_carry):
        lined = docs.select(
            "doc_id",
            F.replace(
                F.col("text"), F.lit(" the "), F.lit("\n")
            ).alias("text"),
        )
        dd = dedup_lines_global(lined, "text", "doc_id")
        pred = dd.select(
            "doc_id", "text", X.lang_id("text").alias("lang_pred")
        )
        if use_carry:
            scored = bigram_lm_perplexity(
                pred, "text", "doc_id", carry=("lang_pred",)
            )
        else:
            scored = bigram_lm_perplexity(pred, "text", "doc_id").join(
                pred.select("doc_id", "lang_pred"), "doc_id"
            )
        out = perplexity_buckets(
            scored, "perplexity", "doc_id", "lang_pred"
        )
        return out.filter(F.col("bucket") != "tail")

    wcc = synth_docs(spark, 500).persist()
    materialize(ccnet(wcc, True))
    materialize(ccnet(wcc, False))
    wcc.unpersist()
    for n in doc_sizes:
        docs = synth_docs(spark, n).persist()
        docs.count()
        record(
            "pipeline_ccnet_carry", n,
            lambda: materialize(ccnet(docs, True)),
        )
        record(
            "pipeline_ccnet_rejoin", n,
            lambda: materialize(ccnet(docs, False)),
        )
        docs.unpersist()

    # WARC parse throughput: N records spread over 8 files (the
    # file-granular parallelism model) — expect ~linear in total bytes;
    # the per-record cost is one header scan + one payload slice.
    import os as _os
    import tempfile as _tempfile

    from tidyvec_spark.sources.warc import read_warc, warc_record_bytes

    def stage_warc(n_records):
        d = _tempfile.mkdtemp(prefix="tv_warc_sweep_")
        body = (b"x" * 900)  # ~1 KB records
        handles = [
            open(_os.path.join(d, f"p{i}.warc"), "wb") for i in range(8)
        ]
        for i in range(n_records):
            handles[i % 8].write(
                warc_record_bytes(f"http://h/{i}", body, f"u:{i}")
            )
        for h in handles:
            h.close()
        return d

    def stage_warc_gz(n_records):
        # same records, Common Crawl wire format: one gzip member per
        # record. Text bodies (not b"x"*900, which gzip collapses to
        # nothing and would understate decompression cost).
        import gzip as _gzip

        d = _tempfile.mkdtemp(prefix="tv_warcgz_sweep_")
        handles = [
            open(_os.path.join(d, f"p{i}.warc.gz"), "wb")
            for i in range(8)
        ]
        for i in range(n_records):
            body = (f"document {i} " * 64).encode()[:900]
            handles[i % 8].write(
                _gzip.compress(
                    warc_record_bytes(f"http://h/{i}", body, f"u:{i}"), 6
                )
            )
        for h in handles:
            h.close()
        return d

    warc_sizes = [20_000, 80_000, 320_000]
    if quick:
        warc_sizes = warc_sizes[:2]
    wd = stage_warc(500)
    materialize(read_warc(spark, wd))
    for n in warc_sizes:
        d = stage_warc(n)
        record(
            "warc_parse", n,
            lambda: materialize(read_warc(spark, d)),
        )
    # .gz vs staged: the member split adds one decompressobj per
    # record — expect a constant-factor overhead over the staged
    # parse, still linear in records and file-granular parallel
    for n in warc_sizes:
        d = stage_warc_gz(n)
        record(
            "warc_gz_parse", n,
            lambda: materialize(read_warc(spark, d)),
        )

    # BPE: distributed per-merge loop vs the collect-threshold driver
    # finish (identical merge table) — the driver finish turns
    # num_merges cluster round-trips into one corpus job + local loop.
    from tidyvec_spark.operators.bpe import bpe_train

    bdocs = synth_docs(spark, 20_000).persist()
    bdocs.count()
    record(
        "bpe_train_distributed", 20_000,
        lambda: len(bpe_train(bdocs, "text", 16, collect_threshold=0)),
    )
    record(
        "bpe_train_driver_finish", 20_000,
        lambda: len(bpe_train(bdocs, "text", 16)),
    )
    # WordPiece: same A/B — the likelihood argmax needs a second agg
    # (symbol counts) per distributed merge, so the driver finish
    # saves even more cluster round-trips than BPE's
    from tidyvec_spark.operators.wordpiece import wordpiece_train

    record(
        "wordpiece_train_distributed", 20_000,
        lambda: len(wordpiece_train(bdocs, "text", 16,
                                    collect_threshold=0)),
    )
    record(
        "wordpiece_train_driver_finish", 20_000,
        lambda: len(wordpiece_train(bdocs, "text", 16)),
    )
    bdocs.unpersist()

    # Blocklist membership A/B at a realistic 5,000-word list: the
    # shipped blocklist_hits uses isin (Catalyst InSet — O(1) hash
    # probe per token); the inline twin below is the pre-round-10
    # array_contains literal scan (O(|list|) per token), kept here so
    # the README claim stays MEASURED round over round.
    from tidyvec_spark.functions.quality import blocklist_hits
    from tidyvec_spark.functions.text import tokens as _toks_fn

    bl_words = [f"badword{i}" for i in range(5_000)]
    bl_lit = F.array(*[F.lit(w) for w in bl_words])
    bl_docs = synth_docs(spark, 50_000).persist()
    bl_docs.count()
    record(
        "blocklist_inset", 50_000,
        lambda: materialize(
            bl_docs.select(blocklist_hits("text", bl_words).alias("h"))
        ),
    )
    record(
        "blocklist_array_scan", 50_000,
        lambda: materialize(
            bl_docs.select(
                F.size(
                    F.filter(
                        _toks_fn("text"),
                        lambda t: F.array_contains(bl_lit, t),
                    )
                ).alias("h")
            )
        ),
    )
    bl_docs.unpersist()

    # Packed token shards: write + read throughput by corpus size —
    # shard-granular parallelism on both sides; expect ~linear
    import tempfile as _tf2

    from tidyvec_spark.functions.hashing import md5_long as _md5l
    from tidyvec_spark.sources.tokenbin import (
        read_token_shards,
        write_token_shards,
    )

    tb_sizes = [20_000, 80_000]
    if quick:
        tb_sizes = tb_sizes[:1]
    for n in tb_sizes:
        tdocs = synth_docs(spark, n).select(
            "doc_id",
            F.transform(
                _toks_fn("text"),
                lambda t: F.pmod(_md5l(t), F.lit(50_000)),
            ).alias("toks"),
        ).persist()
        tdocs.count()
        d = _tf2.mkdtemp(prefix="tv_tokbin_sweep_")
        record(
            "token_shards_write", n,
            lambda: write_token_shards(
                tdocs, d, "doc_id", "toks", n_shards=16
            ).count(),
        )
        record(
            "token_shards_read", n,
            lambda: materialize(read_token_shards(spark, d)),
        )
        tdocs.unpersist()

    # Overlap triage three ways by corpus size: the r11 hll_overlap
    # rewrite (one scan per corpus, was two), vs exact distinct-count
    # inclusion-exclusion, vs ZERO-scan answering from stored
    # manifest sketches — the last should be near-constant in corpus
    # size (it reads 2 x n_shards sketch rows)
    import tempfile as _tf3

    from tidyvec_spark.operators.sketches import (
        hll_overlap,
        hll_overlap_from_sketches,
    )
    from tidyvec_spark.sources.maintenance import corpus_manifest

    ov_sizes = [20_000, 100_000]
    if quick:
        ov_sizes = ov_sizes[:1]
    for n in ov_sizes:
        ovd = synth_docs(spark, n).select("doc_id", "text").persist()
        ovd.count()
        oa = ovd.filter(F.col("doc_id") % 4 < 3)
        ob = ovd.filter(F.col("doc_id") % 3 == 0)
        record(
            "overlap_hll_scan", n,
            lambda: materialize(hll_overlap(oa, ob, "doc_id", lg_k=14)),
        )
        record(
            "overlap_exact", n,
            lambda: materialize(
                oa.select("doc_id").distinct()
                .join(ob.select("doc_id").distinct(), "doc_id")
                .agg(F.count("*").alias("n_intersection"))
            ),
        )
        da, db = _tf3.mkdtemp(prefix="tv_ov_a_"), _tf3.mkdtemp(prefix="tv_ov_b_")
        corpus_manifest(oa, "doc_id", "text", n_shards=16,
                        sketch=True).write.mode("overwrite").parquet(da)
        corpus_manifest(ob, "doc_id", "text", n_shards=16,
                        sketch=True).write.mode("overwrite").parquet(db)
        record(
            "overlap_manifest_zero_scan", n,
            lambda: materialize(
                hll_overlap_from_sketches(
                    spark.read.parquet(da), spark.read.parquet(db), "sketch"
                )
            ),
        )
        ovd.unpersist()

    print("\n== scaling summary (wall_s by size) ==")
    for op, pts in results.items():
        scale = pts[-1][0] / pts[0][0]
        ratio = round(pts[-1][1] / max(pts[0][1], 1e-9), 2)
        curve = "  ".join(f"{s}:{w}s" for s, w in pts)
        print(f"{op:22s} {curve}   ({scale:.0f}x data -> {ratio}x wall)")
    spark.stop()


if __name__ == "__main__":
    main()
