"""Entity resolution: blocking must bound the candidate space, the
levenshtein verify must match an exact python edit distance, and
resolution must be transitive with singletons preserved."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.entities import (
    block_candidate_pairs,
    block_stats,
    entity_match_pairs,
    resolve_entities,
)


@pytest.fixture(scope="module")
def people(spark):
    # three true entities with textual variants + two singletons;
    # blk keeps apples away from bananas so cross-entity pairs that
    # would match by accident are visible as a design smell, not noise
    rows = [
        (1, "Ada Lovelace", "a"),
        (2, "ada  lovelace", "a"),   # case/whitespace variant: dist 0
        (3, "Ada Lovelance", "a"),   # typo: dist 1 from 1
        (4, "Alan Turing", "a"),
        (5, "Alan Turning", "a"),    # dist 1 from 4
        (6, "Grace Hopper", "g"),
        (7, "Grace Hoppers", "g"),   # dist 1 from 6
        (8, "Gordon Moore", "g"),    # singleton in block g
        (9, "Katherine Johnson", "k"),  # singleton block
    ]
    return spark.createDataFrame(rows, ["pid", "name", "blk"])


def test_blocking_bounds_candidates(people):
    pairs = block_candidate_pairs(people, "pid", ["blk"]).collect()
    # block a: C(5,2)=10, block g: C(3,2)=3, block k: 0
    assert len(pairs) == 13
    assert all(r["id_l"] < r["id_r"] for r in pairs)


def test_match_pairs_exact_distances(people):
    got = {
        (r["id_l"], r["id_r"]): r["edit_distance"]
        for r in entity_match_pairs(
            people, "pid", "name", ["blk"], max_edit=1
        ).collect()
    }
    # normalization folds case+whitespace: (1,2) dist 0; typos dist 1
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1
    assert got[(2, 3)] == 1
    assert got[(4, 5)] == 1
    assert got[(6, 7)] == 1
    assert set(got) == {(1, 2), (1, 3), (2, 3), (4, 5), (6, 7)}


def test_match_pairs_threshold_excludes(people):
    # max_edit=0 keeps only the exact-after-normalization variant
    got = entity_match_pairs(people, "pid", "name", ["blk"], max_edit=0)
    assert {(r["id_l"], r["id_r"]) for r in got.collect()} == {(1, 2)}


def test_resolve_entities_transitive_and_singletons(people):
    ent = {
        r["pid"]: r["entity_id"]
        for r in resolve_entities(
            people, "pid", "name", ["blk"], max_edit=1
        ).collect()
    }
    assert ent[1] == ent[2] == ent[3] == 1  # min member id
    assert ent[4] == ent[5] == 4
    assert ent[6] == ent[7] == 6
    assert ent[8] == 8 and ent[9] == 9  # unmatched → own entity
    assert len(ent) == 9  # every record labelled exactly once


def test_resolve_transitive_chain(spark):
    # A~B dist 1, B~C dist 1, A~C dist 2 > max_edit: still ONE entity
    df = spark.createDataFrame(
        [(1, "abcde", "x"), (2, "abcdX", "x"), (3, "abcXX", "x")],
        ["pid", "name", "blk"],
    )
    ent = {
        r["pid"]: r["entity_id"]
        for r in resolve_entities(df, "pid", "name", ["blk"], max_edit=1).collect()
    }
    assert ent[1] == ent[2] == ent[3] == 1


def test_block_stats_pair_costs(people):
    rows = block_stats(people, ["blk"]).collect()
    by_key = {r["block_key_0"]: (r["n_records"], r["n_pairs"]) for r in rows}
    assert by_key == {"a": (5, 10), "g": (3, 3), "k": (1, 0)}


def test_blocking_expression_keys(people):
    # blocking on an EXPRESSION (first letter of the name) — the
    # production shape where no precomputed block column exists
    pairs = entity_match_pairs(
        people,
        "pid",
        "name",
        [F.substring(F.lower(F.col("name")), 1, 4)],
        max_edit=2,
    ).collect()
    assert {(r["id_l"], r["id_r"]) for r in pairs} >= {(4, 5), (6, 7)}


def test_max_edit_validation(people):
    with pytest.raises(ValueError, match="max_edit"):
        entity_match_pairs(people, "pid", "name", ["blk"], max_edit=-1)
