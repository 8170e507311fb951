"""Semantic tests for the hash-seeded dedup operators: plant known
exact/near duplicates, assert they are found and non-dups are not."""

from __future__ import annotations

import pytest

from threat_detection_nosql_spark.operators import dedup

BASE = ("spark query join filter window row stream customer data group "
        "sort merge fast row table scan hash part value batch line key")
NEAR = BASE.replace("customer", "supplier")  # 1 token of ~22 changed
FAR = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
       "mu nu xi omicron pi rho sigma tau upsilon phi chi")


@pytest.fixture(scope="module")
def planted(spark):
    rows = [(0, BASE), (1, BASE), (2, NEAR), (3, FAR),
            (4, "tiny doc"), (5, FAR + " extra words here now")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_planted_dups(spark, planted):
    pairs = {(r.doc_a, r.doc_b)
             for r in dedup.minhash_near_dup_pairs(
                 planted, jaccard_threshold=0.5).collect()}
    assert (0, 1) in pairs            # exact dup
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup
    assert (0, 3) not in pairs and (1, 3) not in pairs  # unrelated


def test_minhash_dedup_keep_canonicalizes(spark, planted):
    out = {r.doc_id: (r.canonical_id, r.is_duplicate)
           for r in dedup.minhash_dedup_keep(
               planted, jaccard_threshold=0.3).collect()}
    assert out[1] == (0, True)        # exact dup folded into doc 0
    assert out[0] == (0, False)       # representative kept
    assert out[3][1] is False         # unrelated doc untouched


def test_simhash_hamming_small_for_near_dups(spark, planted):
    fps = {r.doc_id: r.simhash
           for r in dedup.simhash_fingerprints(planted).collect()}
    assert fps[0] == fps[1]           # identical text → identical simhash
    ham_near = bin(fps[0] ^ fps[2]).count("1")
    ham_far = bin(fps[0] ^ fps[3]).count("1")
    assert ham_near < ham_far         # near-dup closer than unrelated


def test_simhash_pairs_candidate_generation(spark, planted):
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in dedup.simhash_near_dup_pairs(
                 planted, max_hamming=10).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 3) not in pairs


def test_winnowing_identical_docs_share_all_fingerprints(spark, planted):
    fp = dedup.winnowing_fingerprints(planted)
    sets = {r.doc_id: set()
            for r in fp.select("doc_id").distinct().collect()}
    for r in fp.collect():
        sets[r.doc_id].add(r.fingerprint)
    assert sets[0] == sets[1]
    assert sets[0] != sets[3]


def test_fingerprint_overlap_pairs(spark, planted):
    pairs = {(r.doc_a, r.doc_b): r.shared_fingerprints
             for r in dedup.fingerprint_overlap_pairs(planted).collect()}
    assert (0, 1) in pairs            # exact dups share everything
    assert (0, 3) not in pairs        # disjoint vocab → no collisions


def test_connected_components_chain(spark):
    """A~B, B~C, D~E: chain collapses to one component even though A,C
    never pair directly; singleton F untouched (left join keeps id)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    comp = {r["doc_id"]: r["comp"]
            for r in dedup.connected_components(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10


def test_dedup_keep_merges_chains(spark):
    """Three docs where consecutive ones are near-dups but the ends are
    not: all must share one canonical id via component merging."""
    # four disjoint 30-word blocks; consecutive docs share one block
    # (Jaccard ≈ 0.32 between neighbors, 0 between the ends)
    blocks = [[f"w{b}_{i}" for i in range(30)] for b in range(4)]
    docs = spark.createDataFrame(
        [(0, " ".join(blocks[0] + blocks[1])),
         (1, " ".join(blocks[1] + blocks[2])),
         (2, " ".join(blocks[2] + blocks[3]))], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup.minhash_dedup_keep(docs, jaccard_threshold=0.75).collect()}
    assert out[0]["canonical_id"] == 0 and not out[0]["is_duplicate"]
    assert out[1]["canonical_id"] == 0 and out[1]["is_duplicate"]
    assert out[2]["canonical_id"] == 0 and out[2]["is_duplicate"]
