"""Mirror of the driver's correctness gate, in pytest, at sf0.001.

Runs a representative subset of ``__spark_entry__.queries()`` against
their ``oracle_sql()`` twins on DuckDB over the same parquet — the same
order-insensitive (sorted columns, sorted rows, rounded doubles)
comparison the driver applies at sf0.01. The full sweep lives in
``scripts/check_oracle.py``; this subset keeps the suite fast while
covering every operator family (knn, ANN, tfidf, text, dedup,
relational, sessionization, streaming-twin).
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)
SUBSET = [
    "knn_cosine",
    "knn_euclidean",
    "knn_null_quirk",
    "ann_topk_per_query",
    "tfidf_search",
    "text_stats",
    "exact_dup_groups",
    "dedup_drop_exact",
    "minhash_lsh_pairs",
    "bpe_token_stats",
    "q1_pricing",
    "events_sessions",
    "lsh_near_dup",
    "pipeline_curate",
    "embedding_near_dup",
    "bucketed_gemm_near_dup",
    "ngram_jaccard_pairs",
    "ngram_jaccard_capped",
    "ann_ivf_topk_large",
    "dedup_components_two_phase",
    "lsh_near_dup_multi",
    "similarity_join_lsh",
    # demoted below the driver's 50-entry gate window -> their oracle
    # check lives here instead (plus ivfpq, new this round)
    "simhash_fingerprints",
    "ivfpq_adc_topk",
    # curation extension set (tail entries; oracle-checked here)
    "docs_quality_flags",
    "docs_repetition",
    "docs_redact",
    "docs_chunks",
    "docs_pack",
    "mix_temperature",
    "skew_join_events",
    "skew_agg_langs",
    "sq_topk",
    "docs_stream_budget",
    "matryoshka_topk",
    "embedding_health",
    "incremental_near_dup",
    "corpus_rollup",
    "bucketed_join_segments",
    "docs_length_quantiles",
    "docs_pivot_sources",
    "hybrid_rrf",
    "embedding_pool_labels",
    "ann_lsh_batch",
    "split_leakage_free",
    "sample_fixed_per_lang",
    "decontaminate_corpus",
    "pipeline_pretrain",
]


def canon(rows, columns):
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
                    if v == 0:
                        v = 0.0
            vals.append((type(v).__name__ if v is not None else "none", str(v)))
        out.append(tuple(vals))
    out.sort()
    return [columns[i] for i in idx], out


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert name in qs and name in oracles
    sdf = qs[name](spark, SF)
    sc, sv = canon([tuple(r) for r in sdf.collect()], sdf.columns)
    rel = duck.sql(oracles[name])
    dc, dv = canon(rel.fetchall(), rel.columns)
    assert sc == dc, f"schema: {sc} vs {dc}"
    assert len(sv) == len(dv), f"rowcount: {len(sv)} vs {len(dv)}"
    assert sv == dv


def test_every_query_has_oracle_or_is_declared_ml():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {oracles - qs}"
    rows_only = qs - oracles
    # only genuinely non-SQL-expressible ops may skip the oracle
    assert rows_only <= {"kmeans_clusters", "pca_2d", "hf_embed_fake"}, rows_only
