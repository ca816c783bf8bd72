"""Curation primitives: Gopher-style quality rules, repetition,
PII redaction, chunking, sequence packing, temperature mixing.

Unit fixtures pin the SEMANTICS (hand-checkable answers); the
engine-vs-DuckDB value checks live in test_entry_oracle.py
(docs_quality_flags / docs_repetition / docs_redact / docs_chunks /
docs_pack / mix_temperature)."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.functions import quality as Q
from tidyvec_spark.operators.chunking import chunk_documents, pack_sequences
from tidyvec_spark.operators.sampling import (
    temperature_fractions,
    temperature_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "- one\n- two\n- three\n- four"),          # all bullets
        (3, "line\nline\nline\nother"),                 # 50% dup lines
        (4, "wait for it... and then... more... dots..."),
        (5, "### #tags #everywhere # # #"),              # symbol soup
        (6, "12345 67890 11111 22222"),                  # no alpha words
        (7, ""),                                          # empty
        (8, "spam spam spam spam spam spam"),            # one repeated token
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _one(df, doc_id, col):
    return df.filter(F.col("doc_id") == doc_id).first()[col]


def test_line_ratios(spark, docs):
    out = docs.select(
        "doc_id",
        Q.duplicate_line_ratio("text").alias("dup"),
        Q.bullet_line_ratio("text").alias("bul"),
        Q.ellipsis_line_ratio("text").alias("ell"),
    )
    assert _one(out, 2, "bul") == 1.0
    assert _one(out, 3, "dup") == pytest.approx(0.5)  # 4 lines, 2 distinct
    assert _one(out, 1, "bul") == 0.0
    assert _one(out, 7, "dup") == 0.0  # empty text: no lines, ratio 0
    # doc 4 is one line ending in "dots..." -> every line ends with ...
    assert _one(out, 4, "ell") == 1.0


def test_symbol_and_alpha_ratios(spark, docs):
    out = docs.select(
        "doc_id",
        Q.symbol_word_ratio("text").alias("sym"),
        Q.alpha_word_ratio("text").alias("alp"),
    )
    assert _one(out, 5, "sym") > 0.5     # 7 '#' over 6 words
    assert _one(out, 1, "sym") == 0.0
    assert _one(out, 6, "alp") == 0.0    # digits only
    assert _one(out, 1, "alp") == 1.0
    assert _one(out, 7, "alp") == 0.0


def test_top_ngram_fraction(spark, docs):
    out = docs.select(
        "doc_id", Q.top_ngram_fraction("text", 2).alias("f")
    )
    # "spam spam" is all 5 bigrams of doc 8
    assert _one(out, 8, "f") == 1.0
    # doc 1: 11 bigrams, "and again"/"again and" etc. each once except
    # none repeat -> 1/11
    assert _one(out, 1, "f") == pytest.approx(1 / 11)
    assert _one(out, 7, "f") == 0.0


def test_gopher_keep_is_one_projection(spark, docs):
    out = docs.select("doc_id", Q.gopher_keep("text", min_words=2).alias("k"))
    got = {r["doc_id"]: r["k"] for r in out.collect()}
    assert got[1] is True
    assert got[2] is False  # 100% bullet lines
    assert got[5] is False  # symbol ratio
    assert got[6] is False  # no alphabetic words
    assert got[7] is False  # word count
    # quality pass must stay map-side: no shuffle anywhere
    assert P.num_shuffles(out) == 0


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io or visit https://x.io/p?q=1 from 192.168.0.1"),
         (2, "clean text, no pii at all"),
         (3, "ftp not matched: ftp://x.io but http://y.z/ is")],
        ["id", "t"],
    )
    got = {r["id"]: r["c"] for r in df.select("id", Q.redact_pii("t").alias("c")).collect()}
    assert got[1] == "mail <EMAIL> or visit <URL> from <IP>"
    assert got[2] == "clean text, no pii at all"
    assert got[3] == "ftp not matched: ftp://x.io but <URL> is"


def test_chunk_documents_covers_text(spark):
    df = spark.createDataFrame(
        [(1, "a" * 450), (2, "xy"), (3, "")], ["doc_id", "text"]
    )
    out = chunk_documents(df, "text", "doc_id", size=200, overlap=50)
    rows = sorted(
        [(r["doc_id"], r["chunk_idx"], r["chunk"]) for r in out.collect()]
    )
    # doc 1: starts at 1, 151, 301, 451 -> 450 chars => starts 1,151,301
    # (sequence stops at 450 >= start); last chunk shorter
    by_doc = {}
    for d, i, c in rows:
        by_doc.setdefault(d, []).append((i, c))
    assert [i for i, _ in by_doc[1]] == [0, 1, 2]
    assert by_doc[1][0][1] == "a" * 200
    assert by_doc[1][2][1] == "a" * 150
    # short and empty docs still yield exactly one chunk
    assert by_doc[2] == [(0, "xy")]
    assert by_doc[3] == [(0, "")]
    # reconstruction: non-overlap prefixes concatenated = original
    recon = "".join(c[:150] for _, c in by_doc[1][:-1]) + by_doc[1][-1][1]
    assert recon == "a" * 450
    assert P.num_shuffles(out) == 0


def test_chunk_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", size=10, overlap=10)


def test_pack_sequences_hash_semantics(spark):
    df = spark.createDataFrame(
        [(i, 600) for i in range(20)], ["doc_id", "n_toks"]
    )
    out = pack_sequences(
        df, "doc_id", "n_toks", budget=1000, n_buckets=2, salt="s"
    )
    rows = out.collect()
    assert len(rows) == 20  # every doc assigned exactly once
    # offsets inside a bucket are the exclusive running total in
    # doc_id order, and seq_id = offset DIV budget
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for b, rs in by_bucket.items():
        rs.sort(key=lambda r: r["doc_id"])
        run = 0
        for r in rs:
            assert r["seq_offset"] == run
            assert r["seq_id"] == run // 1000
            run += 600
    # single shuffle: the window over buckets
    assert P.num_shuffles(out) == 1


def test_pack_sequences_ffd_invariants(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate([900, 800, 300, 250, 200, 100, 60, 1500])],
        ["doc_id", "n_toks"],
    ).coalesce(1)
    out = pack_sequences(df, "doc_id", "n_toks", budget=1000, strategy="ffd")
    rows = out.collect()
    assert len(rows) == 8
    fills = {}
    for r in rows:
        key = (r["bucket"], r["seq_id"])
        fills[key] = fills.get(key, 0) + r["n_toks"]
    # no sequence over budget except single-doc overflows
    for (b, s), fill in fills.items():
        members = [r for r in rows if (r["bucket"], r["seq_id"]) == (b, s)]
        assert fill <= 1000 or len(members) == 1
    # FFD on one partition: 900+100, 800+200, 300+250+60, 1500 alone
    assert len(fills) == 4


def test_pack_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 5)], ["doc_id", "n_toks"])
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n_toks", budget=0)
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n_toks", strategy="best-fit")


def test_temperature_fractions_shape(spark):
    df = spark.createDataFrame(
        [(i, "en") for i in range(90)] + [(i + 100, "fr") for i in range(10)],
        ["doc_id", "lang"],
    )
    fr = temperature_fractions(df, "lang", alpha=0.5)
    # rarest language kept whole; common one cut toward sqrt mixing
    assert fr["fr"] == 1.0
    assert 0 < fr["en"] < 1
    # alpha=1 is the natural distribution: nothing dropped
    fr1 = temperature_fractions(df, "lang", alpha=1.0)
    assert fr1 == {"en": 1.0, "fr": 1.0}
    with pytest.raises(ValueError):
        temperature_fractions(df, "lang", alpha=1.5)
    # the sampled mixture moves toward balance
    kept = temperature_sample(df, "doc_id", "lang", alpha=0.5, salt="t")
    counts = {r["lang"]: r["n"] for r in
              kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["fr"] == 10  # fraction 1.0 keeps all
    assert counts["en"] < 90


def test_c4_clean_lines_hand_checked(spark):
    from tidyvec_spark.functions.quality import (
        c4_clean_lines,
        c4_page_keep,
    )

    text = (
        "This line survives the filter.\n"
        "too short.\n"                      # < 3 words
        "no terminal punctuation here\n"    # no . ! ? "
        "  Indented but fine, really!\n"    # trim before the rule
        "Enable JavaScript to continue.\n"  # javascript mention
        "\n"
        'He said "stop".\n'
    )
    df = spark.createDataFrame([(1, text)], "id int, t string")
    out = df.select(c4_clean_lines("t").alias("c")).first()["c"]
    assert out == (
        "This line survives the filter.\n"
        "Indented but fine, really!\n"
        'He said "stop".'
    )
    # empty result is '' not NULL (array_join convention)
    empty = spark.createDataFrame([(1, "nope")], "id int, t string")
    assert empty.select(c4_clean_lines("t").alias("c")).first()["c"] == ""
    # page-level drops
    pages = spark.createDataFrame(
        [(1, "Fine page."), (2, "Lorem Ipsum dolor."), (3, "code { block }")],
        "id int, t string",
    )
    kept = sorted(
        r["id"] for r in pages.filter(c4_page_keep("t")).collect()
    )
    assert kept == [1]


def test_c4_clean_is_map_side(spark):
    from tidyvec_spark.functions.quality import c4_clean_lines, c4_page_keep

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = docs.filter(c4_page_keep("text")).select(
        "doc_id", c4_clean_lines("text").alias("c")
    )
    assert P.num_shuffles(out) == 0


def test_normalize_text_expr(spark):
    from tidyvec_spark.functions.quality import normalize_text_expr

    df = spark.createDataFrame(
        [
            (1, "“Smart” ‘quotes’ — and NBSP"),
            (2, "ctrl\x01chars\x7fgone"),
            (3, "  runs   of\t\nspace  "),
            (4, None),
        ],
        "id bigint, text string",
    )
    got = {r["id"]: r["t"] for r in
           df.select("id", normalize_text_expr("text").alias("t")).collect()}
    assert got[1] == "\"Smart\" 'quotes' - and NBSP"
    assert got[2] == "ctrlcharsgone"
    assert got[3] == "runs of space"
    assert got[4] is None


def test_keep_best_fraction(spark):
    from tidyvec_spark.operators.sampling import keep_best_fraction

    df = spark.createDataFrame(
        [(i, "a" if i < 10 else "b", float(i)) for i in range(20)],
        "id bigint, lang string, score double",
    )
    kept = keep_best_fraction(df, "score", "lang", 0.5, "id")
    got = sorted(r["id"] for r in kept.collect())
    # top half by score within each stratum (percent_rank < 0.5 keeps
    # the best ceil-half including rank 0)
    assert set(got) <= {5, 6, 7, 8, 9, 15, 16, 17, 18, 19} | {4, 14}
    assert 9 in got and 19 in got and 0 not in got and 10 not in got
    low = keep_best_fraction(df, "score", "lang", 0.3, "id", ascending=True)
    lows = sorted(r["id"] for r in low.collect())
    assert 0 in lows and 10 in lows and 9 not in lows
    import pytest as pt
    with pt.raises(ValueError):
        keep_best_fraction(df, "score", "lang", 0.0, "id")
    # q = 1.0 keeps EVERYTHING — percent_rank of a stratum's last row
    # is exactly 1.0, so without the short-circuit the strict '<'
    # would silently drop the worst row of every multi-row stratum
    assert keep_best_fraction(df, "score", "lang", 1.0, "id").count() == 20


def test_html_to_text_expr(spark):
    from tidyvec_spark.functions.quality import html_to_text_expr

    html = (
        "<html><head><style>p {color: red}</style>"
        "<script type='x'>var a = '<p>';</script></head>"
        "<body><!-- nav -->"
        "<h1>Title &amp; More</h1>"
        "<p>First   paragraph with <b>bold</b> text.</p>"
        "<p>A &lt;tag&gt; literal &quot;quoted&quot;&nbsp;here.</p>"
        "<ul><li>one</li><li>two</li></ul>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, "no markup"), (3, None)],
                               "id bigint, raw string")
    got = {r["id"]: r["t"] for r in
           df.select("id", html_to_text_expr("raw").alias("t")).collect()}
    lines = got[1].split("\n")
    assert lines[0].strip() == "Title & More"
    assert "First paragraph with bold text." in got[1]
    assert 'A <tag> literal "quoted" here.' in got[1]
    assert "one" in got[1] and "two" in got[1]
    assert "color" not in got[1] and "var a" not in got[1] and "nav" not in got[1]
    assert got[2] == "no markup"
    assert got[3] is None


def test_dedup_lines_within_expr(spark):
    from tidyvec_spark.functions.quality import dedup_lines_within_expr

    df = spark.createDataFrame(
        [
            (1, "banner\nbody one\nbanner\nbody two\n\nbanner"),
            (2, "only\nlines"),
            (3, None),
        ],
        "id bigint, text string",
    )
    got = {r["id"]: r["t"] for r in
           df.select("id", dedup_lines_within_expr("text").alias("t")).collect()}
    assert got[1] == "banner\nbody one\nbody two"
    assert got[2] == "only\nlines"
    assert got[3] is None


def test_compression_ratio_signal(spark):
    """Repetitive text compresses far below varied prose; empty/NULL
    score NULL; the Python twin matches the UDF value-for-value."""
    from tidyvec_spark.functions.quality import (
        compression_ratio_py,
        compression_ratio_udf,
    )

    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam"),
        (2, "the quick brown fox jumps over a lazy dog near the riverbank"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    ratio = compression_ratio_udf()
    got = {
        r["id"]: r["z"]
        for r in df.select("id", ratio(F.col("text")).alias("z")).collect()
    }
    assert got[3] is None and got[4] is None
    assert got[1] < got[2]  # repetition compresses harder
    for i, t in rows[:2]:
        assert got[i] == compression_ratio_py(t)


def test_csv_quarantine_roundtrip(spark, tmp_path):
    """Malformed CSV lines (bad type cast, ragged quote) are captured
    whole; clean rows parse exactly."""
    from tidyvec_spark.sources.delimited import read_csv_quarantine
    from tidyvec_spark.sources.jsonl import split_corrupt

    p = str(tmp_path / "c.csv")
    with open(p, "w") as f:
        f.write("1,en,hello world\n")
        f.write("notanint,en,bad id line\n")
        f.write("3,de,guten tag\n")
    raw = read_csv_quarantine(
        spark, p, "doc_id bigint, lang string, text string"
    ).cache()
    clean, bad = split_corrupt(raw)
    rows = {r.doc_id: (r.lang, r.text) for r in clean.collect()}
    assert rows == {1: ("en", "hello world"), 3: ("de", "guten tag")}
    quarantined = [r[0] for r in bad.collect()]
    assert quarantined == ["notanint,en,bad id line"]


def test_blocklist_rule(spark):
    from tidyvec_spark.functions.quality import blocklist_hits, blocklist_keep
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "clean text entirely fine"),
            (2, "one BAD word here"),
            (3, "bad bad bad everywhere"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        blocklist_hits("text", ["bad"]).alias("h"),
        blocklist_keep("text", ["bad"]).alias("strict"),
        blocklist_keep("text", ["bad"], max_hits=1).alias("budget1"),
    ).collect()
    got = {r.doc_id: (r.h, r.strict, r.budget1) for r in out}
    assert got[1] == (0, True, True)
    assert got[2] == (1, False, True)   # case-insensitive match
    assert got[3] == (3, False, False)
    assert got[4] == (0, True, True)


def test_blocklist_is_map_side(documents):
    from tidyvec_spark import plans as P
    from tidyvec_spark.functions.quality import blocklist_keep

    out = documents.select(blocklist_keep("text", ["slow"]).alias("k"))
    assert P.num_shuffles(out) == 0


def test_quality_ensemble_gates_and_scores(spark, documents):
    from pyspark.sql import functions as F

    from tidyvec_spark.functions.quality import gopher_keep, quality_ensemble
    from tidyvec_spark.functions.text import quality_score

    ens = quality_ensemble(
        hard_gates={"gopher": gopher_keep("text")},
        soft_scores={"rules": (quality_score("text"), 1.0)},
        threshold=0.3,
    )
    out = documents.select(
        "doc_id",
        gopher_keep("text").alias("g"),
        quality_score("text").alias("q"),
        ens["score"].alias("score"),
        ens["keep"].alias("keep"),
        ens["fail_reasons"].alias("why"),
    ).collect()
    for r in out:
        # tolerance, not round(): Python rounds half-even, Spark half-up
        assert abs(r["score"] - r["q"]) <= 5e-7
        assert r["keep"] == (r["g"] and r["score"] >= 0.3)
        want = sorted(
            (["gopher"] if not r["g"] else [])
            + (["low_score"] if r["score"] < 0.3 else [])
        )
        assert r["why"] == want
    # at least one kept and one vetoed on the fixture
    assert any(r["keep"] for r in out) and any(not r["keep"] for r in out)


def test_quality_ensemble_weights_and_validation(spark, documents):
    import pytest as pt
    from pyspark.sql import functions as F

    from tidyvec_spark.functions.quality import quality_ensemble
    from tidyvec_spark.functions.text import quality_score

    # two identical signals at any weights == the signal itself
    ens = quality_ensemble(
        hard_gates={},
        soft_scores={
            "a": (quality_score("text"), 3.0),
            "b": (quality_score("text"), 1.0),
        },
        threshold=0.0,
    )
    rows = documents.select(
        quality_score("text").alias("q"), ens["score"].alias("s")
    ).collect()
    for r in rows:
        assert abs(r["s"] - r["q"]) < 1e-6
    with pt.raises(ValueError):
        quality_ensemble({}, {}, 0.5)
    with pt.raises(ValueError):
        quality_ensemble({}, {"a": (F.lit(1.0), 0.0)}, 0.5)


def test_mojibake_counters(spark):
    df = spark.createDataFrame(
        [
            (1, "clean ascii text"),
            (2, "caf\u00c3\u00a9 menu"),
            (3, "\u00e2\u20ac\u0153quoted\u00e2\u20ac\u009d"),
            (4, "lost \ufffd bytes \ufffd"),
            (5, "bell\u0007and\u0000null"),
            (6, "tab\tand\nnewline are fine"),
            # bare lead chars in clean Latin-script text are NOT
            # mojibake — the pair law must pass them (ADVICE r7)
            (7, "JOÃO lives in SÃO PAULO"),
            (8, None),
        ],
        "id INT, t STRING",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            Q.mojibake_count("t").alias("m"),
            Q.replacement_char_count("t").alias("r"),
            Q.control_char_count("t").alias("c"),
            Q.encoding_clean("t").alias("ok"),
        ).collect()
    }
    assert rows[1]["m"] == 0 and rows[1]["ok"] is True
    assert rows[2]["m"] == 1 and rows[2]["ok"] is False
    assert rows[3]["m"] == 2          # two mojibake-quote openers
    assert rows[4]["r"] == 2 and rows[4]["m"] == 0
    assert rows[5]["c"] == 2 and rows[5]["ok"] is False
    assert rows[6]["c"] == 0 and rows[6]["ok"] is True
    # 'Ã' followed by ASCII is legit text, not a misdecode pair
    assert rows[7]["m"] == 0 and rows[7]["ok"] is True
    # NULL text is False on the gate (not NULL) so it lands on exactly
    # one side of a keep/quarantine split
    assert rows[8]["ok"] is False


def test_mojibake_is_map_side(documents):
    out = documents.select(Q.encoding_clean("text").alias("ok"))
    assert P.num_shuffles(out) == 0


class TestConfusableFold:
    """functions/quality.py::confusable_fold_expr / confusable_count —
    the homoglyph-spoof counter-measure."""

    def test_fold_collides_spoof_with_original(self, spark):
        from pyspark.sql import functions as F

        from tidyvec_spark.functions.quality import confusable_fold_expr

        df = spark.createDataFrame(
            [(1, "page with spam"),
             (2, "раgе with sраm"),     # Cyrillic р/а/е
             (3, "ｐａｇｅ with spam"),  # fullwidth
             (4, "other text")],
            "id INT, text STRING",
        )
        keys = {
            r["id"]: r["k"]
            for r in df.select(
                "id", confusable_fold_expr("text").alias("k")
            ).collect()
        }
        assert keys[1] == keys[2] == keys[3] == "page with spam"
        assert keys[4] == "other text"

    def test_count_flags_spoofed_latin(self, spark):
        from tidyvec_spark.functions.quality import confusable_count

        df = spark.createDataFrame(
            [(1, "clean ascii"), (2, "sраm"), (3, None)],
            "id INT, text STRING",
        )
        got = {
            r["id"]: r["n"]
            for r in df.select(
                "id", confusable_count("text").alias("n")
            ).collect()
        }
        assert got[1] == 0
        assert got[2] == 2  # Cyrillic р and а
        assert got[3] is None

    def test_fold_matches_duckdb_twin(self, spark):
        import duckdb

        from tidyvec_spark.functions.quality import (
            CONFUSABLE_FROM,
            CONFUSABLE_TO,
            confusable_fold_expr,
        )

        samples = ["раgе ｗith ｓрam", "Ηеllο Ѡоrld", "plain", "Ζ３х"]
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(samples)], "id INT, t STRING"
        )
        got = [
            r["f"]
            for r in df.select(confusable_fold_expr("t").alias("f"))
            .orderBy("f").collect()
        ]
        f = CONFUSABLE_FROM.replace("'", "''")
        t = CONFUSABLE_TO.replace("'", "''")
        want = sorted(
            duckdb.sql(
                "SELECT translate(s, '" + f + "', '" + t + "') FROM ("
                + " UNION ALL ".join(
                    f"SELECT '{s}' AS s" for s in samples
                )
                + ")"
            ).df().iloc[:, 0]
        )
        assert got == want


def test_readability_cols_hand_case(spark):
    """readability_cols: exact Flesch on hand-counted sentences /
    words / vowel-group syllables; no-prose documents grade NULL;
    the projection is zero-shuffle codegen."""
    from pyspark.sql import functions as F

    from tidyvec_spark import plans as P
    from tidyvec_spark.functions.quality import readability_cols

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, ""),
            (3, "no terminal punctuation here"),
        ],
        "id long, text string",
    )
    out = df.select("id", *readability_cols("text"))
    got = {r["id"]: r for r in out.collect()}
    # 2 sentences, 6 one-syllable words:
    # flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
    r = got[1]
    assert (r["n_sents"], r["n_words"], r["n_syllables"]) == (2, 6, 6)
    assert abs(r["flesch"] - 119.19) < 1e-9
    assert got[2]["flesch"] is None and got[2]["n_sents"] == 0
    # 'punctuation' = vowel groups u,ua,io -> 3; hand total = 9
    assert got[3]["n_syllables"] == 9
    assert P.num_shuffles(out) == 0


def test_script_ratio_cols_laws(spark):
    """BMP script counting: per-script char counts over mixed text,
    NULL ratios on empty text, ratios sum ≤ 1."""
    from tidyvec_spark.functions.quality import script_ratio_cols

    rows = [
        ("hello мир 123",),   # 5 latin, 3 cyrillic, 3 digit, 2 spaces
        ("漢字かな",),
        ("",),
    ]
    df = spark.createDataFrame(rows, "t string")
    got = df.select(*script_ratio_cols("t")).collect()
    r0 = got[0]
    assert r0["n_chars"] == 13
    assert r0["latin_ratio"] == round(5 / 13, 6)
    assert r0["cyrillic_ratio"] == round(3 / 13, 6)
    assert r0["digit_ratio"] == round(3 / 13, 6)
    assert got[1]["cjk_ratio"] == 1.0
    assert got[2]["latin_ratio"] is None  # empty text: nothing to grade
