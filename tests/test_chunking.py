

def test_cdc_chunks_realign_after_edit(spark):
    """Content-defined cuts depend only on local content: a prefix
    edit changes the first chunk but every downstream chunk hash
    re-aligns — the property fixed-width windows cannot give."""
    from tidyvec_spark.operators.chunking import cdc_chunks

    base = "the quick brown fox jumps over the lazy dog " * 20
    df = spark.createDataFrame(
        [(1, base), (2, "Z" + base), (3, "short"), (4, "")],
        "doc_id INT, text STRING",
    )
    rows = cdc_chunks(df, "text", "doc_id", window=8, divisor=32).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk"], r["chunk_hash"])
        )
    for k in by:
        by[k].sort()
    # chunks reassemble the document exactly
    assert "".join(c for _, c, _ in by[1]) == base
    assert "".join(c for _, c, _ in by[2]) == "Z" + base
    # shorter than window: one chunk, the whole text
    assert [c for _, c, _ in by[3]] == ["short"]
    # empty docs yield no rows
    assert 4 not in by
    # realignment: at most the first (edited) chunk hash differs
    h1 = {h for _, _, h in by[1]}
    h2 = {h for _, _, h in by[2]}
    assert len(h1 & h2) >= len(h1) - 2
    # boilerplate mining: the 20x-repeated sentence makes chunk
    # hashes collide heavily within the doc
    assert len(h1) < len(by[1]) / 4

    import pytest

    with pytest.raises(ValueError, match="window"):
        cdc_chunks(df, "text", "doc_id", window=0)
    with pytest.raises(ValueError, match="divisor"):
        cdc_chunks(df, "text", "doc_id", divisor=0)


def test_cdc_chunks_zero_shuffle(documents):
    from tidyvec_spark import plans
    from tidyvec_spark.operators.chunking import cdc_chunks

    out = cdc_chunks(documents, "text", "doc_id")
    assert plans.num_shuffles(out) == 0


# ------------------------------------------------------------------- FIM


def test_fim_split_reassembles_and_respects_rate(spark):
    from tidyvec_spark.operators.chunking import fim_split

    docs = spark.createDataFrame(
        [(i, f"document body number {i} with some chars") for i in range(200)]
        + [(900, "")],  # empty doc: three empty strings, no ANSI error
        "doc_id bigint, text string",
    )
    rows = fim_split(docs, "text", "doc_id", rate=0.5, salt="t").collect()
    texts = {i: f"document body number {i} with some chars" for i in range(200)}
    texts[900] = ""
    n_fim = 0
    for r in rows:
        orig = texts[r["doc_id"]]
        if r["fim"]:
            n_fim += 1
            assert r["prefix"] + r["middle"] + r["suffix"] == orig
        else:
            assert (r["prefix"], r["middle"], r["suffix"]) == (orig, "", "")
    # hash coin ~ rate (binomial tolerance on 201 docs)
    assert 0.35 <= n_fim / len(rows) <= 0.65
    # deterministic: same salt → identical output, new salt → different picks
    again = fim_split(docs, "text", "doc_id", rate=0.5, salt="t").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    other = fim_split(docs, "text", "doc_id", rate=0.5, salt="u").collect()
    assert {r["doc_id"] for r in other if r["fim"]} != {
        r["doc_id"] for r in rows if r["fim"]
    }


def test_fim_split_rate_bounds_and_plan(spark):
    import pytest as _pytest

    from tidyvec_spark import plans as P
    from tidyvec_spark.operators.chunking import fim_split

    docs = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="rate"):
        fim_split(docs, "text", "doc_id", rate=1.5)
    assert P.num_shuffles(fim_split(docs, "text", "doc_id")) == 0
    # rate=0: pure passthrough shape; rate=1: every row transformed
    all_on = fim_split(docs, "text", "doc_id", rate=1.0).collect()[0]
    assert all_on["fim"] and all_on["prefix"] + all_on["middle"] + all_on["suffix"] == "abc"
    off = fim_split(docs, "text", "doc_id", rate=0.0).collect()[0]
    assert not off["fim"] and off["prefix"] == "abc"


def test_fim_order_psm_spm_laws(spark):
    """fim_order: PSM and SPM assemble the paper's §2/App. D layouts;
    SPM's prefix runs straight into the middle (no sentinel — the
    reassembly property that makes it the AR-compatible inference
    layout); AR rows pass through bare in both modes; zero shuffle."""
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark import plans as P
    from tidyvec_spark.operators.chunking import fim_order, fim_split

    docs = spark.createDataFrame(
        [(i, f"alpha bravo charlie delta echo {i}") for i in range(40)],
        "doc_id bigint, text string",
    )
    fim = fim_split(docs, "text", "doc_id", rate=0.5, salt="t")
    psm = {r["doc_id"]: r["seq"] for r in fim_order(fim, "psm").collect()}
    spm = {r["doc_id"]: r["seq"] for r in fim_order(fim, "spm").collect()}
    by_id = {r["doc_id"]: r for r in fim.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    n_fim = 0
    for i, r in by_id.items():
        if not r["fim"]:
            assert psm[i] == spm[i] == texts[i]
            continue
        n_fim += 1
        p, m, s = r["prefix"], r["middle"], r["suffix"]
        assert psm[i] == f"<fim_pre> {p} <fim_suf> {s} <fim_mid> {m}"
        # SPM: prefix·middle contiguous — stripping the sentinels
        # reassembles the document exactly
        assert spm[i] == f"<fim_pre> <fim_suf> {s} <fim_mid> {p}{m}"
        assert spm[i].split(" <fim_mid> ", 1)[1] == p + m
        assert p + m + s == texts[i]
    assert n_fim > 0
    assert P.num_shuffles(fim_order(fim, "spm")) == 0
    with pytest.raises(ValueError, match="FIM order"):
        fim_order(fim, "msp")


def test_padding_report_sorted_beats_arrival(spark):
    """padding_report: identities hold per strategy (n_docs, sum_len
    invariant across orders; padded >= sum_len), length-sorted
    batching strictly reduces waste on a spread length distribution,
    and the whole A/B is ONE corpus scan with the bucket exchange
    shared by both windows."""
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark import plans as P
    from tidyvec_spark.operators.chunking import padding_report

    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(97)) + 3).alias("ntok"),
    )
    rep = padding_report(docs, "doc_id", "ntok", batch_size=8, n_buckets=4)
    rows = {r["strategy"]: r for r in rep.collect()}
    assert set(rows) == {"sorted", "arrival"}
    for r in rows.values():
        assert r["n_docs"] == 400
        assert r["padded"] >= r["sum_len"]
        assert 0.0 <= r["waste_frac"] < 1.0
    assert rows["sorted"]["sum_len"] == rows["arrival"]["sum_len"]
    assert rows["sorted"]["padded"] < rows["arrival"]["padded"]
    assert P.num_scans(rep) <= 1  # one pass, not one per strategy
    with pytest.raises(ValueError, match="batch_size"):
        padding_report(docs, "doc_id", "ntok", batch_size=0)


def test_segment_runs_islands_and_null_safety(spark):
    """segment_runs: consecutive equal labels collapse into one run,
    runs re-open on change, NULL stretches form their own runs (null-
    safe comparison), and per-id segments are independent."""
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.chunking import segment_runs

    rows = [
        (1, 1, "en"), (1, 2, "en"), (1, 3, "de"),
        (1, 4, None), (1, 5, None), (1, 6, "en"),
        (2, 1, "fr"),
        # leading NULL: lag() is NULL on the first row too, and
        # eqNullSafe(NULL, NULL) is true — without the forced first-
        # row change this run got seg_idx -1 and shifted all later
        # runs (the r11 ADVICE medium finding)
        (3, 1, None), (3, 2, None), (3, 3, "en"),
    ]
    df = spark.createDataFrame(rows, "id int, idx int, lab string")
    got = sorted(
        (r["id"], r["seg_idx"], r["lab"], r["n"], r["idx_lo"], r["idx_hi"])
        for r in segment_runs(df, "id", "idx", "lab").collect()
    )
    assert got == [
        (1, 0, "en", 2, 1, 2),
        (1, 1, "de", 1, 3, 3),
        (1, 2, None, 2, 4, 5),
        (1, 3, "en", 1, 6, 6),
        (2, 0, "fr", 1, 1, 1),
        (3, 0, None, 2, 1, 2),
        (3, 1, "en", 1, 3, 3),
    ]


def test_truncation_report_exact_costs(spark):
    """truncation_report: exact kept/lost identities on a known
    length multiset; zero shuffle beyond the 1-row reduction."""
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.chunking import truncation_report

    df = spark.createDataFrame(
        [(10,), (20,), (30,), (40,)], "n long"
    )
    got = {r["max_len"]: r for r in
           truncation_report(df, "n", [25, 100]).collect()}
    r25 = got[25]
    assert r25["n_docs"] == 4 and r25["n_truncated"] == 2
    assert r25["tokens_kept"] == 10 + 20 + 25 + 25
    assert r25["tokens_lost"] == 5 + 15
    assert abs(r25["lost_frac"] - 20 / 100) < 1e-9
    r100 = got[100]
    assert r100["n_truncated"] == 0 and r100["tokens_lost"] == 0
    with pytest.raises(ValueError, match="lengths"):
        truncation_report(df, "n", [])


def test_span_corruption_matches_python_replay(spark):
    """span_corruption_report: an independent hashlib replay of the
    full law (hash-ladder starts, clipped lengths, interval-union
    merge) matches per document; empty docs report zeros; masked spans
    never exceed the document; validation raises."""
    import hashlib

    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.chunking import span_corruption_report

    salt, p_start, max_span = "t", 0.3, 3

    def hu(key):
        h = hashlib.md5((salt + key).encode()).hexdigest()[:8]
        return int(h, 16) / 2**32

    def replay(doc_id, n):
        islands = []
        for p in range(n):
            if hu(f"{doc_id}:{p}") < p_start:
                L = 1 + int(hu(f"{doc_id}:{p}:L") * max_span)
                e = min(p + L, n)
                if islands and p <= islands[-1][1]:
                    islands[-1][1] = max(islands[-1][1], e)
                else:
                    islands.append([p, e])
        return len(islands), sum(e - p for p, e in islands)

    rows = [(i, " ".join(f"w{j}" for j in range(cnt)))
            for i, cnt in enumerate([0, 1, 5, 17, 40, 63])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_corruption_report(
        df, "text", "doc_id", p_start=p_start, max_span=max_span,
        salt=salt, round_to=6).collect()}
    assert len(got) == 6
    for i, cnt in enumerate([0, 1, 5, 17, 40, 63]):
        ns, nm = replay(i, cnt)
        r = got[i]
        assert (r["n_tokens"], r["n_spans"], r["n_masked"]) == (cnt, ns, nm)
        assert r["n_masked"] <= cnt
        want_frac = round(nm / cnt, 6) if cnt else 0.0
        assert r["masked_frac"] == want_frac

    with pytest.raises(ValueError, match="p_start"):
        span_corruption_report(df, "text", "doc_id", p_start=0.0)
    with pytest.raises(ValueError, match="max_span"):
        span_corruption_report(df, "text", "doc_id", max_span=0)
