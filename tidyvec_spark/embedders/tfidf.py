"""TF-IDF embedder as pure Spark dataflow (no driver-side vocabulary).

The reference fits TF-IDF with text2vec on an in-memory corpus and
returns a closure producing *dense* vectors over the pruned vocabulary
(reference R/embedders.R:335-366). A dense-vector translation would be
the wrong shape at 100 TB (vocab-wide arrays per row, a driver-held
vocabulary). This engine keeps the same observable semantics but stores
the model as *data*:

- ``fit``: tokenize -> explode -> aggregate term statistics; the fitted
  model is a (term, idx, df, idf) DataFrame. Fitting is one shuffle on
  term; pruning ``min_freq`` matches the reference's corpus-term-count
  pruning (text2vec ``term_count_min``), NOT document-frequency.
- document side: sparse (doc, term, weight) triples + per-doc L2 norms.
- query side: cosine(query, doc) over sparse triples is a *broadcast
  join on the query's terms* + one aggregation — the inverted-index
  formulation; Catalyst prunes every term not in the query.
- dense ``embed_column`` is still provided for parity with the
  reference's contract (array over vocabulary, index = alphabetical
  term order) — useful at small vocab sizes.

Weighting (documented; deterministic and oracle-reproducible):
  tf(d,t)  = count(t in d) / total_tokens(d)        (all tokens counted)
  idf(t)   = ln((N + 1) / (df_t + 1)) + 1           (smoothed)
  w(d,t)   = tf * idf
The reference inherits text2vec's defaults; exact numeric parity with
text2vec is not a goal (documented divergence) — OOV-query behavior is:
a query with no in-vocabulary term raises, matching R/embedders.R:359-361.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidyvec_spark.embedders.base import (
    EmbedderSpec,
    FittedEmbedder,
    register_embedder,
)

TOKEN_PATTERN = r"\s+"


def tokens_expr(col):
    """Lowercase whitespace tokenization, empty strings dropped.

    Matches the keyword-scorer tokenization (reference R/core.R:301-303)
    and is reproducible in ANSI SQL (regexp_split + filter).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_PATTERN), lambda t: t != "")


class TfidfEmbedder(EmbedderSpec):
    kind = "tfidf"

    def __init__(self, min_freq: int = 2):
        self.min_freq = int(min_freq)

    def fit(self, df: DataFrame, content_col: str) -> "FittedTfidf":
        n_docs = df.count()
        # one shuffle on term: corpus count (pruning) + doc frequency (idf).
        # The doc id MUST be assigned before explode — a
        # monotonically_increasing_id in the same projection as explode
        # would get a fresh value per token row, not per document.
        stats = (
            df.withColumn("_doc", F.monotonically_increasing_id())
            .select("_doc", F.explode(tokens_expr(content_col)).alias("term"))
            .groupBy("term")
            .agg(
                F.count("*").alias("corpus_count"),
                F.countDistinct("_doc").alias("doc_freq"),
            )
            .filter(F.col("corpus_count") >= self.min_freq)
        )
        vocab = stats.select(
            "term",
            "doc_freq",
            (F.log((F.lit(float(n_docs + 1))) / (F.col("doc_freq") + F.lit(1.0)))
             + F.lit(1.0)).alias("idf"),
        )
        # NOTE: the dense index (idx) is NOT computed here — it needs a
        # global Window.orderBy over the vocabulary (a single-partition
        # sort), and the sparse search path never uses it. FittedTfidf
        # builds it lazily the first time a dense-parity path asks.
        vocab = vocab.cache()
        dim = vocab.count()  # materializes the cache
        return FittedTfidf(vocab=vocab, n_docs=n_docs, dim=dim,
                           min_freq=self.min_freq)


class FittedTfidf(FittedEmbedder):
    """Fitted TF-IDF: vocabulary-as-DataFrame (term, doc_freq, idf, idx)."""

    def __init__(self, vocab: DataFrame, n_docs: int, dim: int, min_freq: int):
        self.vocab = vocab
        self.n_docs = n_docs
        self.dim = dim
        self.min_freq = min_freq
        self._vocab_dense: DataFrame | None = None

    @property
    def vocab_dense(self) -> DataFrame:
        """Vocabulary with the deterministic dense index (idx =
        alphabetical term order), built lazily on first dense-path use:
        the global ``Window.orderBy`` it needs is a single-partition
        sort of the whole vocabulary, which the sparse search path
        (the scale path) must never pay for."""
        if "idx" in self.vocab.columns:  # rehydrated from an artifact
            return self.vocab
        if self._vocab_dense is None:
            from pyspark.sql import Window

            self._vocab_dense = self.vocab.withColumn(
                "idx", F.row_number().over(Window.orderBy("term")) - F.lit(1)
            ).cache()
        return self._vocab_dense

    # -- sparse side (the scale path) ----------------------------------
    def doc_term_weights(
        self, df: DataFrame, content_col: str, id_col: str
    ) -> DataFrame:
        """(id, term, weight) sparse TF-IDF triples for each document.

        Weight uses tf = term_count / total_tokens(doc) where
        total_tokens counts ALL tokens (in- and out-of-vocabulary).
        """
        toks = df.select(
            F.col(id_col).alias("_id"),
            F.explode(tokens_expr(content_col)).alias("term"),
        )
        counts = toks.groupBy("_id", "term").agg(F.count("*").alias("tc"))
        totals = toks.groupBy("_id").agg(F.count("*").alias("tot"))
        return (
            counts.join(totals, "_id")
            .join(F.broadcast(self.vocab.select("term", "idf")), "term")
            .select(
                F.col("_id").alias(id_col),
                "term",
                ((F.col("tc").cast("double") / F.col("tot").cast("double"))
                 * F.col("idf")).alias("weight"),
            )
        )

    def doc_norms(self, weights: DataFrame, id_col: str) -> DataFrame:
        """(id, norm): L2 norm of each document's full tf-idf vector."""
        return weights.groupBy(id_col).agg(
            F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("norm")
        )

    # -- query side -----------------------------------------------------
    def query_term_weights(self, text: str) -> dict[str, float]:
        """Driver-side TF-IDF weights of a query string over the fitted
        vocabulary. Raises on a fully out-of-vocabulary query, matching
        the reference (R/embedders.R:359-361).
        """
        toks = [t for t in str(text).lower().split() if t]
        if not toks:
            raise ValueError("query is empty after tokenization")
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        idf_rows = (
            self.vocab.filter(F.col("term").isin(list(counts)))
            .select("term", "idf")
            .collect()
        )
        if not idf_rows:
            raise ValueError(
                f"query {text!r} contains no in-vocabulary terms "
                f"(vocabulary size {self.dim})"
            )
        tot = float(len(toks))
        return {r["term"]: (counts[r["term"]] / tot) * r["idf"] for r in idf_rows}

    def embed_query(self, text: str) -> list[float]:
        """Dense query vector over the vocabulary (alphabetical index)."""
        w = self.query_term_weights(text)
        idx_rows = (
            self.vocab_dense.filter(F.col("term").isin(list(w)))
            .select("term", "idx")
            .collect()
        )
        out = [0.0] * int(self.dim)
        for r in idx_rows:
            out[r["idx"]] = w[r["term"]]
        return out

    def search(
        self,
        df: DataFrame,
        content_col: str,
        id_col: str,
        query: str,
        n: int = 5,
        min_score: float = 0.0,
        keyword_weight: float = 0.0,
        round_to: int | None = None,
        score_col: str = "similarity",
    ) -> DataFrame:
        """Sparse inverted-index cosine search — the 100 TB shape of
        ``nearest`` over a TF-IDF collection.

        Instead of materializing dense vocab-wide vectors and scanning
        them (the reference's physical plan), score =
        sum over the *query's* terms of w_doc * w_query — a broadcast
        join on a handful of terms. Catalyst prunes every non-matching
        term at the first join; the dense array column never exists.
        Docs sharing no term with the query score 0 (same value the
        dense cosine would give them).

        Output: (id_col, score_col) — score rounded when ``round_to``
        is set (used for oracle hash comparison), filtered by
        ``min_score``, top-n with id tiebreak.
        """
        qw = self.query_term_weights(query)  # raises on OOV, parity
        qnorm = math.sqrt(sum(w * w for w in qw.values()))
        spark = df.sparkSession
        qdf = spark.createDataFrame(
            [(t, float(w)) for t, w in sorted(qw.items())], "term string, qw double"
        )
        weights = self.doc_term_weights(df, content_col, id_col)
        # ONE corpus scan: left-join the tiny broadcast query-term table
        # and fold the query dot product and the document norm in the
        # same aggregation (separate dots/norms branches would scan and
        # shuffle the weights twice)
        stats = (
            weights.join(F.broadcast(qdf), "term", "left")
            .groupBy(id_col)
            .agg(
                F.sum(
                    F.col("weight") * F.coalesce(F.col("qw"), F.lit(0.0))
                ).alias("_dot"),
                F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("norm"),
            )
        )
        sim = F.coalesce(
            F.col("_dot")
            / (F.when(F.col("norm") == 0.0, F.lit(None)).otherwise(F.col("norm"))
               * F.lit(qnorm)),
            F.lit(0.0),
        )
        if keyword_weight:
            qterms = sorted({t for t in str(query).lower().split() if t})
            from tidyvec_spark.functions.vector import keyword_score_expr
            kw = keyword_score_expr(F.col(content_col), qterms)
            sim = (F.lit(1.0 - keyword_weight) * sim
                   + F.lit(float(keyword_weight)) * kw)
        if round_to is not None:
            sim = F.round(sim, round_to)
        scored = (
            df.select(id_col, content_col)
            .join(stats, id_col, "left")
            .withColumn(score_col, sim)
            .filter(F.col(score_col) >= F.lit(float(min_score)))
            .select(id_col, score_col)
            .orderBy(F.desc(score_col), F.asc(id_col))
            .limit(int(n))
        )
        return scored

    # -- dense side (reference-contract parity) -------------------------
    def embed_column(self, df: DataFrame, content_col: str, out_col: str) -> DataFrame:
        """Dense ``array<double>`` of size |vocab| per document.

        Assembly is map_from_entries + sequence scatter — still pure
        dataflow, but O(|vocab|) per row; intended for reference-parity
        and small vocabularies. The sparse path above is the scale path.
        """
        id_tmp = "__tv_doc_id"
        with_id = df.withColumn(id_tmp, F.monotonically_increasing_id())
        weights = self.doc_term_weights(with_id, content_col, id_tmp)
        pairs = (
            weights.join(F.broadcast(self.vocab_dense.select("term", "idx")), "term")
            .groupBy(id_tmp)
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("idx"), F.col("weight")))
                ).alias("_m")
            )
        )
        # try_element_at on a map<int,double> is keyed lookup (NULL when
        # missing, even under ANSI); keys are the 0-based vocab indices.
        dense = F.transform(
            F.sequence(F.lit(0), F.lit(int(self.dim) - 1)),
            lambda i: F.coalesce(F.try_element_at(F.col("_m"), i), F.lit(0.0)),
        )
        out = (
            with_id.join(pairs, id_tmp, "left")
            .withColumn(out_col, dense)
            .drop("_m", id_tmp)
        )
        return out

    def spec_json(self) -> dict[str, Any]:
        return {
            "kind": "tfidf",
            "min_freq": self.min_freq,
            "n_docs": self.n_docs,
            "dim": self.dim,
            # vocab itself is persisted as parquet next to the sidecar by
            # write_vec; path filled in there.
            "vocab_path": getattr(self, "vocab_path", None),
        }


def _rehydrate_tfidf(spec: dict[str, Any], spark: SparkSession) -> FittedTfidf:
    path = spec.get("vocab_path")
    if not path:
        raise ValueError("tfidf sidecar missing vocab_path")
    vocab = spark.read.parquet(path).cache()
    return FittedTfidf(
        vocab=vocab,
        n_docs=int(spec["n_docs"]),
        dim=int(spec["dim"]),
        min_freq=int(spec.get("min_freq", 2)),
    )


register_embedder("tfidf", _rehydrate_tfidf)
