

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
