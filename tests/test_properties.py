"""Property-based tests (SURVEY §5.2.3): the native column-expression
similarity kernels must agree with an independent numpy formulation on
arbitrary finite inputs, and obey the algebraic invariants the search
semantics rely on (symmetry, bounds, self-similarity, the euclidean
distance→similarity transform).

One Spark job per hypothesis example; examples are small batches of
vector pairs so each job is one collect over a handful of rows.
"""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tidyvec_spark.functions.vector import (
    array_lit,
    cosine_sim_expr,
    dot_expr,
    euclidean_sim_expr,
    l2_normalize_expr,
)

finite = st.floats(
    min_value=-100.0,
    max_value=100.0,
    allow_nan=False,
    allow_infinity=False,
    width=32,
)


@st.composite
def vector_pairs(draw):
    d = draw(st.integers(min_value=1, max_value=8))
    n = draw(st.integers(min_value=1, max_value=5))
    vecs = st.lists(finite, min_size=d, max_size=d)
    return [(draw(vecs), draw(vecs)) for _ in range(n)]


def _kernels(spark, pairs):
    df = spark.createDataFrame(
        [(a, b) for a, b in pairs], "a array<double>, b array<double>"
    )
    rows = df.select(
        cosine_sim_expr("a", "b").alias("cos_ab"),
        cosine_sim_expr("b", "a").alias("cos_ba"),
        dot_expr("a", "b").alias("dot"),
        euclidean_sim_expr("a", "b").alias("euc"),
        euclidean_sim_expr("a", "a").alias("euc_self"),
    ).collect()
    return rows


SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SET
@given(pairs=vector_pairs())
def test_kernels_match_numpy_and_invariants(spark, pairs):
    rows = _kernels(spark, pairs)
    for (a, b), r in zip(pairs, rows):
        va, vb = np.array(a, dtype=np.float64), np.array(b, dtype=np.float64)
        na, nb = np.linalg.norm(va), np.linalg.norm(vb)

        # dot kernel == numpy dot
        assert math.isclose(r["dot"], float(va @ vb), rel_tol=1e-9, abs_tol=1e-9)

        # cosine: engine convention scores 0 when either norm is 0
        expect_cos = 0.0 if na == 0 or nb == 0 else float(va @ vb) / (na * nb)
        assert math.isclose(r["cos_ab"], expect_cos, rel_tol=1e-6, abs_tol=1e-9)
        # symmetry + bounds (fp slack)
        assert math.isclose(r["cos_ab"], r["cos_ba"], rel_tol=1e-9, abs_tol=1e-12)
        assert -1.0 - 1e-9 <= r["cos_ab"] <= 1.0 + 1e-9

        # euclidean similarity: 1/(1+d), in (0, 1], self-sim exactly 1
        d = float(np.linalg.norm(va - vb))
        assert math.isclose(r["euc"], 1.0 / (1.0 + d), rel_tol=1e-6, abs_tol=1e-9)
        assert 0.0 < r["euc"] <= 1.0 + 1e-9
        assert r["euc_self"] == pytest.approx(1.0)


@SET
@given(pairs=vector_pairs())
def test_l2_normalize_unit_norm(spark, pairs):
    vecs = [a for a, _ in pairs]
    df = spark.createDataFrame([(v,) for v in vecs], "a array<double>")
    rows = df.select(l2_normalize_expr("a").alias("u"), "a").collect()
    for r in rows:
        va = np.array(r["a"], dtype=np.float64)
        if np.linalg.norm(va) == 0:
            continue  # zero vectors pass through by convention
        assert math.isclose(
            float(np.linalg.norm(np.array(r["u"], dtype=np.float64))),
            1.0,
            rel_tol=1e-6,
        )


@SET
@given(pairs=vector_pairs())
def test_query_literal_kernel_matches_column_kernel(spark, pairs):
    """nearest() scores against a broadcast literal query vector; the
    literal path must equal the column-vs-column path."""
    for a, b in pairs[:2]:
        df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
        r = df.select(
            cosine_sim_expr("a", array_lit(b)).alias("lit_cos"),
            cosine_sim_expr("a", "b").alias("col_cos"),
        ).first()
        assert math.isclose(
            r["lit_cos"], r["col_cos"], rel_tol=1e-9, abs_tol=1e-12
        )


def test_matryoshka_prefix_is_unit_norm(spark):
    import math

    from tidyvec_spark.functions.vector import matryoshka_expr
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    out = emb.select(
        "vec_id", matryoshka_expr("embedding", 16).alias("m")
    ).limit(20).collect()
    for r in out:
        assert len(r["m"]) == 16
        assert math.isclose(sum(x * x for x in r["m"]), 1.0, rel_tol=1e-9)
    # no-renormalize keeps raw prefix values
    raw = emb.select(
        "vec_id",
        matryoshka_expr("embedding", 4, renormalize=False).alias("m"),
        "embedding",
    ).first()
    assert raw["m"] == [float(x) for x in raw["embedding"][:4]]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        matryoshka_expr("embedding", 0)


def test_matryoshka_search_invariants(spark):
    """Two MRL truncation invariants that hold for ANY vectors (the
    recall-vs-dims curve itself needs MRL-trained embeddings — the
    random fixtures have no information concentration to preserve):
    (a) dot over renormalized prefixes == cosine over raw prefixes;
    (b) the query row retrieves itself first at every prefix width."""
    import math

    from pyspark.sql import functions as F

    from tidyvec_spark.functions.vector import (
        array_lit,
        matryoshka_expr,
        similarity_expr,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    qfull = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    for dims in (16, 48):
        q = qfull[:dims]
        nrm = math.sqrt(sum(x * x for x in q))
        qn = [x / nrm for x in q]
        renorm_dot = emb.select(
            "vec_id",
            F.round(
                similarity_expr(
                    matryoshka_expr("embedding", dims), array_lit(qn), "dot"
                ),
                6,
            ).alias("s"),
        )
        raw_cos = emb.select(
            "vec_id",
            F.round(
                similarity_expr(
                    matryoshka_expr("embedding", dims, renormalize=False),
                    array_lit(q),
                    "cosine",
                ),
                6,
            ).alias("s"),
        )
        a = {r["vec_id"]: r["s"] for r in renorm_dot.collect()}
        b = {r["vec_id"]: r["s"] for r in raw_cos.collect()}
        assert a == b
        top = (
            renorm_dot.orderBy(F.desc("s"), F.asc("vec_id")).limit(1).first()
        )
        assert top["vec_id"] == 0


def test_embedding_stats_expr(spark):
    from tidyvec_spark.functions.vector import embedding_stats_expr
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, float("nan")])], ["id", "v"]
    )
    rows = {
        r["id"]: r["s"]
        for r in df.select("id", embedding_stats_expr("v").alias("s")).collect()
    }
    assert rows[1]["dim"] == 2 and abs(rows[1]["l2_norm"] - 5.0) < 1e-12
    assert rows[1]["n_nan"] == 0 and rows[2]["n_nan"] == 1
    assert rows[1]["min_val"] == 3.0 and rows[1]["max_val"] == 4.0


@SET
@given(
    toks=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=25),
    budget=st.integers(min_value=100, max_value=1000),
)
def test_pack_sequences_tiles_each_bucket(spark, toks, budget):
    """Hash packing invariant on arbitrary inputs: within every bucket
    the documents' token intervals [offset, offset+tok) tile the
    concatenated stream exactly — disjoint, gap-free, starting at 0 —
    and seq_id is the budget-quantized start offset. (This is the
    property a training-data loader relies on to cut sequences.)"""
    from tidyvec_spark.operators.chunking import pack_sequences

    df = spark.createDataFrame(
        [(i, int(t)) for i, t in enumerate(toks)], ["doc_id", "n_toks"]
    )
    rows = pack_sequences(
        df, "doc_id", "n_toks", budget=budget, n_buckets=3, salt="p"
    ).collect()
    assert len(rows) == len(toks)  # nothing dropped or duplicated
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rs in by_bucket.values():
        rs.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in rs:
            assert r["seq_offset"] == expect
            assert r["seq_id"] == expect // budget
            expect += r["n_toks"]


def test_dedup_lines_idempotent(spark, sf_dir):
    """Line dedup is a projection onto its own fixed point: running it
    twice must equal running it once (no line survives twice, so the
    second pass finds nothing to drop)."""
    from pyspark.sql import functions as F
    from tidyvec_spark.operators.dedup import dedup_lines_global

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.replace(F.col("text"), F.lit(" the "), F.lit("\n")).alias("text")
    )
    once = dedup_lines_global(docs, "text", "doc_id")
    twice = dedup_lines_global(once.select("doc_id", "text"), "text", "doc_id")
    a = {(r["doc_id"], r["text"]) for r in once.collect()}
    b = {(r["doc_id"], r["text"]) for r in twice.collect()}
    assert a == b


def test_corpus_diff_self_is_empty(spark, sf_dir):
    from tidyvec_spark.operators.dedup import corpus_diff

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert corpus_diff(docs, docs, "text", "doc_id").count() == 0


def test_bpe_apply_reproduces_training_fixpoint(spark):
    """Applying the learned merge table to the raw spelled corpus must
    reproduce the trainer's final symbolization (merge application is
    deterministic and order-faithful)."""
    from tidyvec_spark.operators.bpe import (
        bpe_apply_expr,
        bpe_train,
        bpe_word_freq,
    )

    corpus = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        "id bigint, text string",
    )
    merges = bpe_train(corpus, "text", 4)
    applied = {
        r["s"]
        for r in bpe_word_freq(corpus, "text")
        .select(bpe_apply_expr("sym", merges).alias("s"))
        .collect()
    }
    # fixpoint: re-applying any learned merge to the applied corpus
    # changes nothing (every adjacency it targets was consumed, in
    # order, exactly as during training)
    import re
    for a, b, _ in merges:
        pat = re.compile(f"(?<![^ ]){re.escape(a)} {re.escape(b)}(?![^ ])")
        for s in applied:
            assert pat.sub(lambda m: a + b, s) == s, (a, b, s)


@given(
    st.lists(
        st.text(
            alphabet=" aAbB.?!\t‘’“”–— \x01\n",
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_normalize_text_idempotent(spark, texts):
    """normalize(normalize(x)) == normalize(x) — the canonicalization
    law that makes it safe to run the cleanup pass any number of
    times (re-ingest, retry, composed pipelines)."""
    from tidyvec_spark.functions.quality import normalize_text_expr

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id bigint, t string"
    )
    once = df.select("id", normalize_text_expr("t").alias("t"))
    twice = once.select("id", normalize_text_expr("t").alias("t"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_substring_cut_is_idempotent(spark):
    """Cutting duplicated spans leaves a corpus with no >= k-token
    cross-doc duplication (owner copies remain but their duplicates
    are gone), so a second pass is a no-op."""
    from tidyvec_spark.operators.dedup import substring_dedup_cut

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "p q a b c d e f r s"),
            (3, "a b c d e f x y z w"),
        ],
        "doc_id bigint, text string",
    )
    once = substring_dedup_cut(docs, "text", "doc_id", k=4)
    again = substring_dedup_cut(
        once.select("doc_id", "text"), "text", "doc_id", k=4
    )
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in again.collect()}
    assert a == b
    assert all(r["n_cut"] == 0 for r in again.collect())


def test_random_projection_is_linear(spark):
    """JL projection is a linear map: P(x + y) == P(x) + P(y) and
    P(c x) == c P(x) (same fold order on both paths, so equality is
    exact up to double rounding in the sum order — checked to 1e-9)."""
    from tidyvec_spark.operators.reduce import random_projection_py

    x = [float((i * 37 % 19) - 9) / 7.0 for i in range(64)]
    y = [float((i * 11 % 23) - 11) / 5.0 for i in range(64)]
    px = random_projection_py(x, 16)
    py_ = random_projection_py(y, 16)
    pxy = random_projection_py([a + b for a, b in zip(x, y)], 16)
    for got, want in zip(pxy, (a + b for a, b in zip(px, py_))):
        assert abs(got - want) < 1e-9
    p2x = random_projection_py([2.0 * a for a in x], 16)
    for got, want in zip(p2x, (2.0 * a for a in px)):
        assert abs(got - want) < 1e-9


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=0, max_size=300,
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=40, deadline=None)
def test_pcm16_decode_is_inverse_of_encode(samples, rate):
    import struct

    from tidyvec_spark.operators.multimodal import (
        decode_pcm16,
        parse_wav_header,
    )

    data = b"".join(struct.pack("<h", s) for s in samples)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert list(decode_pcm16(wav)) == samples
    hdr = parse_wav_header(wav)
    assert hdr == (rate, 1, len(samples))


@given(
    w=st.integers(min_value=1, max_value=11),
    h=st.integers(min_value=1, max_value=11),
    seed=st.integers(min_value=0, max_value=10_000),
    topdown=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_bmp_gray_decode_handles_any_stride_and_row_order(w, h, seed, topdown):
    """Row padding to 4-byte multiples and both row orders (positive
    height = bottom-up, negative = top-down) must decode to the same
    top-down gray matrix."""
    import struct

    from tidyvec_spark.operators.multimodal import decode_bmp_gray

    gray = [[(seed + r * 31 + c * 7) % 256 for c in range(w)]
            for r in range(h)]
    stride = ((w * 3 + 3) // 4) * 4
    px = bytearray()
    rows = range(h) if topdown else range(h - 1, -1, -1)
    for r in rows:
        row = bytearray()
        for c in range(w):
            g = gray[r][c]
            row += bytes((g, g, g))
        row += b"\x00" * (stride - len(row))
        px += row
    signed_h = -h if topdown else h
    hdr = (
        b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, signed_h, 1, 24, 0,
                      len(px), 0, 0, 0, 0)
    )
    out = decode_bmp_gray(bytes(hdr) + bytes(px))
    assert out.tolist() == gray


# ---------------------------------------------------------------------------
# round-9 law properties: confusable fold, WordPiece roundtrip, ICT slots
# ---------------------------------------------------------------------------

words = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll",), max_codepoint=0x24F
    ),
    min_size=1,
    max_size=8,
)


@given(st.lists(st.text(max_size=40), min_size=1, max_size=5))
@SET
def test_confusable_fold_idempotent(spark, texts):
    """fold(fold(x)) == fold(x): every fold target is Basic Latin /
    ASCII, which the confusable map never maps FROM — so one pass is a
    fixed point (a second cleaning pass can't change keys)."""
    from tidyvec_spark.functions.quality import confusable_fold_expr

    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    rows = df.select(
        confusable_fold_expr("t").alias("one"),
        confusable_fold_expr(confusable_fold_expr("t")).alias("two"),
    ).collect()
    for r in rows:
        assert r["one"] == r["two"]


@given(st.lists(words, min_size=1, max_size=6))
@SET
def test_wordpiece_tokenize_roundtrip_when_chars_covered(spark, ws):
    """Whenever the vocabulary covers every character form of the
    corpus, greedy longest-match never emits [UNK] and detokenization
    is lossless (strip markers, join)."""
    from tidyvec_spark.operators.wordpiece import (
        _wordpiece_train_local,
        wordpiece_tokenize,
        wordpiece_vocab,
    )

    text = " ".join(ws)
    wf: dict = {}
    for w in ws:
        sym = " ".join(c if i == 0 else "##" + c for i, c in enumerate(w))
        wf[sym] = wf.get(sym, 0) + 1
    merges = _wordpiece_train_local(dict(wf), 3)
    vocab = wordpiece_vocab(wf, merges)
    df = spark.createDataFrame([(1, text)], "id INT, text STRING")
    out = wordpiece_tokenize(df, "text", vocab).first()["pieces"]
    assert "[UNK]" not in out
    rebuilt = " ".join(
        p for p in out.replace(" ##", "").split(" ") if p
    )
    assert rebuilt == text.lower()


@given(
    st.lists(
        st.text(alphabet="abc xyz", min_size=3, max_size=12).filter(
            lambda s: s.strip()
        ),
        min_size=2,
        max_size=6,
    )
)
@SET
def test_ict_pairs_slot_laws(spark, sents):
    """The query is exactly one sentence slot; the context is the
    in-order join of the others; n_sentences matches the split."""
    from tidyvec_spark.operators.mining import ict_pairs

    cleaned = [" ".join(s.split()) for s in sents if s.strip()]
    if len(cleaned) < 2 or len(set(cleaned)) != len(cleaned):
        return  # duplicate sentences make the slot index ambiguous
    text = ". ".join(cleaned) + "."
    df = spark.createDataFrame([(1, text)], "doc_id INT, text STRING")
    r = ict_pairs(df, "text", "doc_id").first()
    assert r["n_sentences"] == len(cleaned)
    assert r["query"] in cleaned
    qi = cleaned.index(r["query"])
    assert r["context"] == " ".join(
        s for i, s in enumerate(cleaned) if i != qi
    )


def test_embedding_covariance_matches_numpy(spark):
    """embedding_covariance: the distributed BLAS-partial path equals
    numpy's population covariance; NULLs are excluded; wrong-length
    rows raise rather than silently bias."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.reduce import embedding_covariance

    rng = np.random.RandomState(7)
    X = rng.randn(200, 5) * [1.0, 2.0, 0.5, 3.0, 1.5] + rng.randn(5)
    rows = [(i, [float(x) for x in X[i]]) for i in range(200)]
    rows.append((200, None))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    got = np.zeros((5, 5))
    for r in embedding_covariance(df, "embedding", dim=5).collect():
        got[r["i"], r["j"]] = got[r["j"], r["i"]] = r["cov"]
    want = np.cov(X, rowvar=False, bias=True)
    assert np.allclose(got, want, atol=1e-9)

    bad = spark.createDataFrame(
        [(0, [1.0, 2.0])], "id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="embedding length"):
        embedding_covariance(bad, "embedding", dim=5).collect()
    with pytest.raises(ValueError, match="dim"):
        embedding_covariance(df, "embedding", dim=0)


def test_whiten_embeddings_identity_covariance(spark):
    """whiten_embeddings: ZCA output has (numerically) identity
    covariance and zero mean — the operator's defining property —
    measured by running embedding_covariance ON its own output."""
    import numpy as np
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.reduce import (
        embedding_covariance,
        whiten_embeddings,
    )

    rng = np.random.RandomState(11)
    # anisotropic: one dominant direction drowning the rest
    base = rng.randn(300, 4) @ np.diag([5.0, 1.0, 0.3, 0.1])
    rows = [(i, [float(x) for x in base[i]]) for i in range(300)]
    # NULL embeddings pass through with a NULL out_col (row-count
    # preserving — the ADVICE r11 join-back-by-id contract), and are
    # excluded from the fit like embedding_covariance documents.
    rows += [(1000, None), (1001, None)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    w = whiten_embeddings(df, "embedding", dim=4, id_cols=["id"])
    assert w.columns == ["id", "whitened"]
    assert w.count() == 302
    nulls = w.filter(F.col("whitened").isNull()).select("id").collect()
    assert sorted(r["id"] for r in nulls) == [1000, 1001]
    got = np.zeros((4, 4))
    for r in embedding_covariance(w, "whitened", dim=4).collect():
        got[r["i"], r["j"]] = got[r["j"], r["i"]] = r["cov"]
    assert np.allclose(got, np.eye(4), atol=1e-2)
    mu = w.select(
        *[F.avg(F.col("whitened")[i]).alias(f"m{i}") for i in range(4)]
    ).first()
    assert all(abs(mu[f"m{i}"]) < 1e-9 for i in range(4))


def test_events_transition_matrix_laws(spark, sf_dir):
    """events_transition_matrix: rows normalize to 1 (over rounded
    cells within rounding error), counts sum to (events − users with
    ≥1 event), every probability in (0, 1]."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    qs = entry.queries()
    rows = qs["events_transition_matrix"](spark, sf_dir).collect()
    assert rows
    by_prev = {}
    for r in rows:
        assert 0.0 < r["p"] <= 1.0
        by_prev.setdefault(r["prev_type"], []).append(r["p"])
    for prev, ps in by_prev.items():
        assert abs(sum(ps) - 1.0) < 1e-4, prev
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_events - n_users


def test_effective_rank_bounds_and_collapse(spark):
    """Participation ratio: an isotropic cloud reads ≈ d; a rank-1
    line reads ≈ 1; always within [1, d] (Roy & Vetterli 2007)."""
    import numpy as np

    from tidyvec_spark.operators.reduce import effective_rank

    rng = np.random.default_rng(7)
    iso = rng.normal(size=(400, 8))
    d1 = np.outer(rng.normal(size=400), np.ones(8))
    rows_iso = [(i, [float(x) for x in iso[i]]) for i in range(400)]
    rows_d1 = [(i, [float(x) for x in d1[i]]) for i in range(400)]
    schema = "id long, embedding array<double>"
    pr_iso = effective_rank(
        spark.createDataFrame(rows_iso, schema), "embedding", 8,
        cov_round=6, round_to=6,
    ).first()["effective_rank"]
    pr_d1 = effective_rank(
        spark.createDataFrame(rows_d1, schema), "embedding", 8,
        cov_round=6, round_to=6,
    ).first()["effective_rank"]
    assert 6.0 < pr_iso <= 8.0
    assert 1.0 <= pr_d1 < 1.2


def test_embedding_anisotropy_laws(spark):
    """Anisotropy (mean pairwise cosine, Ethayarajh 2019): identical
    vectors read 1; a balanced ± pair of directions reads ≈ -1/(n-1)
    summed to ~0-ish (exactly -1/3 for 2+2 opposed); an isotropic-ish
    random cloud reads ≈ 0; the closed form equals the brute-force
    pair mean; partition-invariant; single vector yields NULL."""
    import itertools

    import numpy as np

    from tidyvec_spark.operators.reduce import embedding_anisotropy

    def run(vecs, parts=1):
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "id long, embedding array<double>",
        ).repartition(parts)
        return embedding_anisotropy(df, "embedding", round_to=6).collect()[0]

    # all-identical: every pairwise cosine is 1
    r = run([[1.0, 2.0, 3.0]] * 5)
    assert r["n_vectors"] == 5 and abs(r["anisotropy"] - 1.0) < 2e-6

    # two opposed pairs: pairwise cosines are +1 (2 pairs) and -1
    # (4 pairs) -> mean = (2-4)/6 = -1/3
    r = run([[1.0, 0.0], [1.0, 0.0], [-1.0, 0.0], [-1.0, 0.0]])
    assert abs(r["anisotropy"] - (-1.0 / 3.0)) < 2e-6

    # closed form == brute force on a random cloud
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8)
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    brute = np.mean(
        [u[i] @ u[j] for i, j in itertools.permutations(range(20), 2)]
    )
    r = run([list(v) for v in vecs])
    assert abs(r["anisotropy"] - brute) < 1e-5  # 1e-6 quantization grain

    # partition invariance (the integer law sees values, not order)
    r2 = run([list(v) for v in vecs], parts=7)
    assert r2["anisotropy"] == r["anisotropy"]

    # n = 1 -> NULL (no pairs)
    r = run([[1.0, 2.0]])
    assert r["n_vectors"] == 1 and r["anisotropy"] is None
