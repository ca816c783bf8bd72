"""Contrastive hard-negative mining: hand-checked semantics + the
LSH-vs-exact recall relationship on real fixture embeddings."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.ann import random_planes
from tidyvec_spark.operators.mining import hard_negative_pairs

SF = "/root/testdata/sf0.001"


def test_hard_negatives_hand_checked(spark):
    # 2-d vectors: anchors get the nearest OTHER-label vector, never a
    # same-label one, never themselves
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [0.99, 0.1]),   # same label as 1 -> never its negative
        (3, 1, [0.9, 0.2]),    # closest other-label to 1
        (4, 1, [0.0, 1.0]),
        (5, 2, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "id bigint, label int, emb array<double>")
    got = {
        (r["anchor_id"], r["neg_rank"]): r["neg_id"]
        for r in hard_negative_pairs(
            df, "emb", "id", "label", k=2, round_to=6
        ).collect()
    }
    assert got[(1, 1)] == 3          # nearest different-label
    assert got[(2, 1)] == 3
    assert got[(3, 1)] in (1, 2)     # anchor 3's nearest label-0
    # no same-label pair anywhere
    labels = {r[0]: r[1] for r in rows}
    for (a, _), n in got.items():
        assert labels[a] != labels[n]
        assert a != n


def test_hard_negatives_lsh_subset_of_exact(spark):
    """The LSH path returns a subset of the exact candidates (recall
    < 1 is allowed, false positives are not): every mined pair must
    carry the exact cosine score, and every LSH pair must appear in
    the exact pair pool for its anchor."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("embedding"),
    ).limit(200)
    planes = random_planes(64, nbits=6, seed=7)
    lsh = hard_negative_pairs(
        emb, "embedding", "vec_id", "label", k=3,
        planes=planes, probe_hamming=1, round_to=6,
    ).collect()
    exact_pool = {
        (r["anchor_id"], r["neg_id"]): r["similarity"]
        for r in hard_negative_pairs(
            emb, "embedding", "vec_id", "label", k=10_000, round_to=6
        ).collect()
    }
    assert len(lsh) > 0
    for r in lsh:
        key = (r["anchor_id"], r["neg_id"])
        assert key in exact_pool
        assert r["similarity"] == exact_pool[key]


def test_hard_negatives_rejects_bad_k(spark):
    df = spark.createDataFrame(
        [(1, 0, [1.0])], "id bigint, label int, emb array<double>"
    )
    with pytest.raises(ValueError):
        hard_negative_pairs(df, "emb", "id", "label", k=0)


def test_mutual_topk_pairs_hand_checked(spark):
    from tidyvec_spark.operators.mining import mutual_topk_pairs

    # 1 and 2 point the same way (mutual #1); 3 is orthogonal to both;
    # 4 is close to 3 -> (3,4) mutual; with k=1 no cross-group pair
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.9, 0.2]),
    ]
    df = spark.createDataFrame(rows, "id INT, v ARRAY<DOUBLE>")
    got = {
        (r["a"], r["b"])
        for r in mutual_topk_pairs(df, "id", "v", k=1).collect()
    }
    assert got == {(1, 2), (3, 4)}

    # k large enough: every pair becomes mutual; all emitted a < b
    all_pairs = mutual_topk_pairs(df, "id", "v", k=3).collect()
    assert len(all_pairs) == 6
    assert all(r["a"] < r["b"] for r in all_pairs)


def test_mutual_topk_pairs_edges_injection(spark):
    from tidyvec_spark.operators.mining import mutual_topk_pairs

    # precomputed directed edges: 1->2 and 2->1 mutual, 3->1 one-way
    edges = spark.createDataFrame(
        [(1, 2, 0.9), (2, 1, 0.9), (3, 1, 0.5)],
        "a INT, b INT, sim DOUBLE",
    )
    got = mutual_topk_pairs(
        spark.range(0), "id", "v", k=2, edges=edges
    ).collect()
    assert [(r["a"], r["b"], r["sim"]) for r in got] == [(1, 2, 0.9)]

    with pytest.raises(ValueError):
        mutual_topk_pairs(spark.range(1), "id", "id", k=0)


def test_mutual_topk_pairs_null_and_empty_and_bound(spark):
    """The GEMM scoring stage's envelope guards: NULL embeddings are
    excluded on both sides (the engine-wide NULL-embedding law), an
    empty / all-NULL corpus yields an empty frame instead of a numpy
    axis error, and the driver collect is bounded by
    collect_row_bound (the ngram_jaccard_pairs exact_row_bound
    pattern)."""
    from tidyvec_spark.operators.mining import mutual_topk_pairs

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, None),  # must be neither anchor nor candidate
    ]
    df = spark.createDataFrame(rows, "id INT, v ARRAY<DOUBLE>")
    got = {
        (r["a"], r["b"])
        for r in mutual_topk_pairs(df, "id", "v", k=2).collect()
    }
    assert got == {(1, 2)}

    empty = spark.createDataFrame([], "id INT, v ARRAY<DOUBLE>")
    assert mutual_topk_pairs(empty, "id", "v", k=1).count() == 0
    all_null = spark.createDataFrame([(1, None)], "id INT, v ARRAY<DOUBLE>")
    assert mutual_topk_pairs(all_null, "id", "v", k=1).count() == 0

    with pytest.raises(ValueError, match="collect_row_bound"):
        mutual_topk_pairs(df, "id", "v", k=1, collect_row_bound=1).count()


def test_ict_pairs_hand_checked(spark):
    """Inverse Cloze Task: the hash-picked sentence leaves the
    context; remaining sentences join in order; short docs drop."""
    from tidyvec_spark.functions.hashing import md5_long
    from tidyvec_spark.operators.mining import ict_pairs

    df = spark.createDataFrame(
        [(1, "alpha one. beta two. gamma three."),
         (2, "only sentence"),          # n=1 -> dropped
         (3, None)],                    # NULL -> dropped
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r for r in ict_pairs(df, "text", "doc_id").collect()}
    assert set(rows) == {1}
    r = rows[1]
    assert r["n_sentences"] == 3
    sents = ["alpha one", "beta two", "gamma three"]
    qi = df.sparkSession.range(1).select(
        (md5_long(F.lit("1")) % 3).alias("q")
    ).first()["q"]
    assert r["query"] == sents[qi]
    assert r["context"] == " ".join(s for i, s in enumerate(sents) if i != qi)


def test_ict_pairs_salt_changes_pick_and_validation(spark):
    from tidyvec_spark.operators.mining import ict_pairs

    df = spark.createDataFrame(
        [(7, "a one. b two. c three. d four. e five. f six. g seven. h eight.")],
        "doc_id INT, text STRING",
    )
    picks = {
        salt: ict_pairs(df, "text", "doc_id", salt=salt).first()["query"]
        for salt in ("", "epoch1", "epoch2", "epoch3")
    }
    assert len(set(picks.values())) >= 2  # re-salting moves the pick
    # deterministic per salt
    assert picks[""] == ict_pairs(df, "text", "doc_id").first()["query"]

    with pytest.raises(ValueError):
        ict_pairs(df, "text", "doc_id", min_sentences=1)


def test_ict_pairs_zero_shuffle(spark):
    from tidyvec_spark import plans as P
    from tidyvec_spark.operators.mining import ict_pairs

    df = spark.createDataFrame(
        [(1, "a one. b two.")], "doc_id INT, text STRING"
    )
    assert P.num_shuffles(ict_pairs(df, "text", "doc_id")) == 0


def test_ict_pairs_zero_sentence_docs_drop_cleanly(spark):
    """ANSI-mode regression pin: an empty/whitespace/'...' document
    (zero sentences) must DROP, never raise REMAINDER_BY_ZERO from the
    hash pick or INVALID_ARRAY_INDEX from the slot lookup."""
    from tidyvec_spark.operators.mining import ict_pairs

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "..."), (4, ". . ."),
         (5, "one good. two good.")],
        "doc_id INT, text STRING",
    )
    got = {r["doc_id"] for r in ict_pairs(df, "text", "doc_id").collect()}
    assert got == {5}


# ---------------------------------------------------------------- margin


def _margin_numpy(src, tgt, k):
    """Independent pure-numpy twin of the margin law (ratio criterion,
    Artetxe & Schwenk 2019): top-k by cosine each way, avg of each
    anchor's top-k, margin = sim / mean(avg_x, avg_y)."""
    import numpy as np

    sids, S = zip(*src)
    tids, T = zip(*tgt)
    S, T = np.array(S, float), np.array(T, float)

    def cos(A, B):
        na = np.linalg.norm(A, axis=1)[:, None]
        nb = np.linalg.norm(B, axis=1)[None, :]
        d = na * nb
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(d == 0, 0.0, (A @ B.T) / d)

    M = np.round(cos(S, T), 6)
    fwd, avg_s, cand = {}, {}, set()
    for i, a in enumerate(sids):
        order = np.lexsort((tids, -M[i]))[:k]
        avg_s[a] = M[i][order].mean()
        cand |= {(a, tids[j]) for j in order}
    avg_t = {}
    for j, b in enumerate(tids):
        order = np.lexsort((sids, -M[:, j]))[:k]
        avg_t[b] = M[:, j][order].mean()
        cand |= {(sids[i], b) for i in order}
    out = {}
    for a, b in cand:
        s = M[list(sids).index(a)][list(tids).index(b)]
        den = (avg_s[a] + avg_t[b]) / 2
        out[(a, b)] = (s, round(s / den, 6) if den > 0 else 0.0)
    return out


def test_margin_pairs_match_numpy_twin(spark):
    import numpy as np

    from tidyvec_spark.operators.dedup import release
    from tidyvec_spark.operators.mining import margin_pairs

    rng = np.random.default_rng(7)
    src = [(i, rng.normal(size=8).tolist()) for i in range(10)]
    tgt = [(i + 100, rng.normal(size=8).tolist()) for i in range(12)]
    sdf = spark.createDataFrame(src, "id bigint, v array<double>")
    tdf = spark.createDataFrame(tgt, "id bigint, v array<double>")
    got = margin_pairs(
        sdf, tdf, "id", "v", k=3, threshold=0.0, round_to=6
    )
    rows = {
        (r["src_id"], r["tgt_id"]): (r["sim"], r["margin"])
        for r in got.collect()
    }
    release(got)
    # the engine applies threshold>=0.0 AFTER scoring; mirror it
    want = {
        k: v for k, v in _margin_numpy(src, tgt, 3).items() if v[1] >= 0.0
    }
    assert rows.keys() == want.keys()
    for key in want:
        assert rows[key][0] == pytest.approx(want[key][0], abs=1e-6)
        assert rows[key][1] == pytest.approx(want[key][1], abs=1e-6)


def test_margin_downweights_hubs(spark):
    """The discriminating case for the RATIO criterion: a hub target
    near EVERY source scores high absolute cosine everywhere, but its
    neighborhood average is equally high, so its margins hug 1.0 —
    while an isolated true pair with lower absolute cosine clears the
    threshold. An absolute-cosine threshold cannot separate these."""
    from tidyvec_spark.operators.dedup import release
    from tidyvec_spark.operators.mining import margin_pairs

    src = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    # hub 100 ~ equally near all sources; 101 pairs with source 3 only
    tgt = [
        (100, [0.58, 0.58, 0.58]),
        (101, [0.05, 0.05, 0.99]),
    ]
    sdf = spark.createDataFrame(src, "id bigint, v array<double>")
    tdf = spark.createDataFrame(tgt, "id bigint, v array<double>")
    got = margin_pairs(sdf, tdf, "id", "v", k=2, threshold=0.0, round_to=6)
    rows = {
        (r["src_id"], r["tgt_id"]): (r["sim"], r["margin"])
        for r in got.collect()
    }
    release(got)
    # absolute cosine ranks (1,100) ABOVE (3,101)... margin flips it
    assert rows[(1, 100)][0] > 0.5
    assert rows[(3, 101)][1] > rows[(1, 100)][1]
    # the hub's margins hug 1.0
    for s in (1, 2):
        assert rows[(s, 100)][1] < rows[(3, 101)][1]


def test_margin_best_selection_and_threshold(spark):
    from tidyvec_spark.operators.dedup import release
    from tidyvec_spark.operators.mining import margin_pairs

    import numpy as np

    rng = np.random.default_rng(11)
    src = [(i, rng.normal(size=6).tolist()) for i in range(8)]
    tgt = [(i + 50, rng.normal(size=6).tolist()) for i in range(8)]
    sdf = spark.createDataFrame(src, "id bigint, v array<double>")
    tdf = spark.createDataFrame(tgt, "id bigint, v array<double>")
    all_pairs = margin_pairs(
        sdf, tdf, "id", "v", k=3, threshold=0.0, round_to=6
    )
    best = margin_pairs(
        sdf, tdf, "id", "v", k=3, threshold=0.0, round_to=6,
        select="best",
    )
    a = all_pairs.collect()
    b = best.collect()
    release(all_pairs)
    release(best)
    # best = per-src argmax of the threshold output (margin desc, tgt asc)
    want = {}
    for r in sorted(a, key=lambda r: (r["src_id"], -r["margin"], r["tgt_id"])):
        want.setdefault(r["src_id"], (r["tgt_id"], r["margin"]))
    got = {r["src_id"]: (r["tgt_id"], r["margin"]) for r in b}
    assert got == want
    # threshold filters in both modes
    thr = margin_pairs(sdf, tdf, "id", "v", k=3, threshold=1.02, round_to=6)
    assert all(r["margin"] >= 1.02 for r in thr.collect())
    release(thr)


def test_margin_null_embeddings_and_bounds(spark):
    from tidyvec_spark.operators.mining import margin_pairs

    sdf = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)], "id bigint, v array<double>"
    )
    tdf = spark.createDataFrame(
        [(9, [1.0, 0.1]), (10, None)], "id bigint, v array<double>"
    )
    rows = margin_pairs(sdf, tdf, "id", "v", k=2, threshold=0.0).collect()
    ids = {(r["src_id"], r["tgt_id"]) for r in rows}
    assert ids == {(1, 9)}  # NULL rows are neither anchor nor candidate
    with pytest.raises(ValueError, match="collect_row_bound"):
        margin_pairs(
            sdf, tdf, "id", "v", k=1, collect_row_bound=0
        )


def test_margin_ann_edge_seam_matches_exact(spark):
    """Drop-in ANN seam: feeding the exact edges back through
    edges_fwd=/edges_bwd= must reproduce the computed path exactly."""
    import numpy as np

    from tidyvec_spark.operators.dedup import release
    from tidyvec_spark.operators.mining import (
        _exact_cross_topk_edges_gemm,
        margin_pairs,
    )

    rng = np.random.default_rng(3)
    src = [(i, rng.normal(size=5).tolist()) for i in range(6)]
    tgt = [(i + 20, rng.normal(size=5).tolist()) for i in range(6)]
    sdf = spark.createDataFrame(src, "id bigint, v array<double>")
    tdf = spark.createDataFrame(tgt, "id bigint, v array<double>")
    ef = _exact_cross_topk_edges_gemm(sdf, "id", "v", tdf, "id", "v", 3, round_to=6)
    eb = _exact_cross_topk_edges_gemm(tdf, "id", "v", sdf, "id", "v", 3, round_to=6)
    via_seam = margin_pairs(
        sdf, tdf, "id", "v", k=3, threshold=0.0, round_to=6,
        edges_fwd=ef, edges_bwd=eb,
    )
    direct = margin_pairs(sdf, tdf, "id", "v", k=3, threshold=0.0, round_to=6)
    s = sorted(map(tuple, via_seam.collect()))
    d = sorted(map(tuple, direct.collect()))
    release(via_seam)
    release(direct)
    assert s == d


# ------------------------------------------------------------ crop pairs


def test_crop_pairs_match_pure_python_twin(spark):
    """Independent twin of the cropping law: hash_unit lengths/starts
    over whitespace tokens, exact string comparison."""
    import hashlib

    from tidyvec_spark.operators.mining import crop_pairs

    def hu(i, salt):
        h = hashlib.md5((salt + str(i)).encode()).hexdigest()[:8]
        return int(h, 16) / 2**32

    texts = {
        i: " ".join(f"w{i}x{j}" for j in range(1 + i % 12)) for i in range(30)
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["crop_a"], r["crop_b"])
        for r in crop_pairs(
            df, "text", "doc_id", min_frac=0.2, max_frac=0.6, salt="cp"
        ).collect()
    }
    import math

    for i, text in texts.items():
        toks = text.lower().split()
        n = len(toks)
        want = [n]
        # delta computed the same way crop_pairs does (hi - lo in
        # Python floats): 0.6 - 0.2 is NOT double(0.4), and the twin
        # must track the engine's literal, not the pretty one
        delta = 0.6 - 0.2
        for tag in ("a", "b"):
            ln = max(
                1, math.floor(n * (0.2 + hu(i, "cp" + tag + "len") * delta))
            )
            start = math.floor(hu(i, "cp" + tag + "start") * (n - ln + 1))
            want.append(" ".join(toks[start:start + ln]))
        assert got[i] == tuple(want), (i, got[i], want)


def test_crop_pairs_edges(spark):
    import pytest as _pytest

    from tidyvec_spark import plans as P
    from tidyvec_spark.operators.mining import crop_pairs

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "single"), (4, "two tokens here now")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in crop_pairs(df, "text", "doc_id").collect()}
    assert set(rows) == {3, 4}  # zero-token docs yield no pair
    assert rows[3]["crop_a"] == rows[3]["crop_b"] == "single"
    assert P.num_shuffles(crop_pairs(df, "text", "doc_id")) == 0
    with _pytest.raises(ValueError, match="min_frac"):
        crop_pairs(df, "text", "doc_id", min_frac=0.0)
    with _pytest.raises(ValueError, match="min_frac"):
        crop_pairs(df, "text", "doc_id", min_frac=0.6, max_frac=0.5)
    # salt changes the views (on a corpus with enough feasible windows)
    big = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(30))) for i in range(20)],
        "doc_id bigint, text string",
    )
    a = crop_pairs(big, "text", "doc_id", salt="e1").collect()
    b = crop_pairs(big, "text", "doc_id", salt="e2").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, b))


def test_margin_ann_seam_partial_edges_not_dropped(spark):
    """An anchor present only on the reversed side (ANN miss in one
    direction) must still be scored — its missing neighborhood average
    falls back to the other endpoint's, never a silent inner-join
    drop."""
    from tidyvec_spark.operators.dedup import release
    from tidyvec_spark.operators.mining import margin_pairs

    sdf = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "id bigint, v array<double>"
    )
    tdf = spark.createDataFrame(
        [(9, [1.0, 0.1])], "id bigint, v array<double>"
    )
    # forward edges exist only for src 1; src 2 appears ONLY as the
    # target of a backward edge
    ef = spark.createDataFrame([(1, 9, 0.9)], "a bigint, b bigint, sim double")
    eb = spark.createDataFrame(
        [(9, 1, 0.9), (9, 2, 0.4)], "a bigint, b bigint, sim double"
    )
    got = margin_pairs(
        sdf, tdf, "id", "v", k=2, threshold=0.0, round_to=6,
        edges_fwd=ef, edges_bwd=eb,
    )
    rows = {(r["src_id"], r["tgt_id"]): r["margin"] for r in got.collect()}
    release(got)
    assert (2, 9) in rows  # the one-sided anchor survives
    # avg_src(2) falls back to avg_tgt(9) = (0.9+0.4)/2 = 0.65
    assert rows[(2, 9)] == pytest.approx(0.4 / 0.65, abs=1e-6)
    assert rows[(1, 9)] == pytest.approx(0.9 / ((0.9 + 0.65) / 2), abs=1e-6)


def test_event_sequences_order_and_cap(spark):
    """event_sequences: partitioning-independent order (array_sort on
    the order-struct), cap keeps the FIRST max_len items, n_events
    counts the uncapped total."""
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.mining import event_sequences

    rows = [(1, i, f"e{i}") for i in range(30)] + [(2, 0, "x")]
    df = spark.createDataFrame(
        rows, "u int, t int, ev string"
    ).repartition(7)
    got = {r["u"]: r for r in
           event_sequences(df, "u", ["t"], "ev", max_len=5).collect()}
    assert got[1]["n_events"] == 30
    assert got[1]["seq"] == ["e0", "e1", "e2", "e3", "e4"]
    assert got[2]["seq"] == ["x"] and got[2]["n_events"] == 1
    with pytest.raises(ValueError, match="max_len"):
        event_sequences(df, "u", ["t"], "ev", max_len=0)
