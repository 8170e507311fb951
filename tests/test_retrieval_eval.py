"""Round-7 retrieval/statistics wave: RRF hybrid search, nDCG@10,
Poisson bootstrap CI, split-conformal threshold — semantic invariants
the oracle hash can't express (oracle parity itself rides the
parametrized sweeps in test_pipeline_queries/test_metrics_queries)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from threat_detection_nosql_spark.queries.metrics import (
    _BOOT_MOD,
    _NDCG_GAINS,
    _NDCG_IDEAL,
    _POIS_T,
    bootstrap_revenue_ci,
    conformal_price_threshold,
    ndcg_retrieval_eval,
)
from threat_detection_nosql_spark.queries.pipeline import (
    _RRF_DEPTH,
    _RRF_K,
    _RRF_TOPN,
    rrf_hybrid_search,
)


def test_rrf_fusion_formula_and_shape(spark):
    rows = rrf_hybrid_search(spark, SF_DIR).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert sorted(by_q) == list(range(8))
    for q, items in by_q.items():
        assert len(items) == _RRF_TOPN
        assert sorted(r.rank for r in items) == list(range(1, _RRF_TOPN + 1))
        for r in items:
            # the emitted score is exactly the RRF of the emitted ranks
            expect = ((1.0 / (_RRF_K + r.r_lex) if r.r_lex else 0.0)
                      + (1.0 / (_RRF_K + r.r_sem) if r.r_sem else 0.0))
            assert abs(r.rrf - expect) < 1e-6
            assert r.r_lex is None or 1 <= r.r_lex <= _RRF_DEPTH
            assert r.r_sem is None or 1 <= r.r_sem <= _RRF_DEPTH
            assert r.item_id != q
        # fused order is non-increasing in rrf
        scores = [r.rrf for r in sorted(items, key=lambda x: x.rank)]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
    # fusion is doing real work: some top item appears in both lists
    assert any(r.r_lex and r.r_sem for r in rows)


def test_ndcg_bounds_and_gain_table(spark):
    # the embedded literals are the textbook discounts
    for r, g in enumerate(_NDCG_GAINS, start=1):
        assert g == round(1e9 / math.log2(r + 1))
    assert _NDCG_IDEAL[0] == _NDCG_GAINS[0]
    assert all(a < b for a, b in zip(_NDCG_IDEAL, _NDCG_IDEAL[1:]))
    rows = ndcg_retrieval_eval(spark, SF_DIR).collect()
    assert [r.q_id for r in rows] == list(range(8))
    for r in rows:
        assert 0.0 <= r.ndcg_at_10 <= 1.0
        assert 0 <= r.hits_at_10 <= min(10, r.n_relevant)
        if r.hits_at_10 == 0:
            assert r.ndcg_at_10 == 0.0
    assert any(0.0 < r.ndcg_at_10 < 1.0 for r in rows), \
        "fixture degenerate: every query trivially perfect/empty"


def test_bootstrap_weights_replay_the_portable_hash(spark):
    """The Poisson weight is a pure function of the Carter-Wegman
    stream (h1 + b*h2) mod P seeded by two md5 draws per key —
    recompute it with hashlib for a probe of (key, replicate) pairs
    and compare against the Spark expression."""
    from threat_detection_nosql_spark.operators.dedup import (
        _portable_hash60,
    )
    from threat_detection_nosql_spark.queries.metrics import _BOOT_P
    probe = [(str(k), b) for k in (1, 7, 1337) for b in (0, 31, 63)]
    h1c = F.pmod(_portable_hash60(F.concat(F.lit("boot-a:"),
                                           F.col("k"))), F.lit(_BOOT_P))
    h2c = F.pmod(_portable_hash60(F.concat(F.lit("boot-b:"),
                                           F.col("k"))),
                 F.lit(_BOOT_P - 1)) + 1
    df = (spark.createDataFrame(probe, "k string, b int")
          .select("k", "b",
                  (F.pmod(h1c + F.col("b") * h2c, F.lit(_BOOT_P))
                   % _BOOT_MOD).alias("bucket")))
    for r in df.collect():
        h1 = int(hashlib.md5(f"boot-a:{r.k}".encode())
                 .hexdigest()[:15], 16) % _BOOT_P
        h2 = int(hashlib.md5(f"boot-b:{r.k}".encode())
                 .hexdigest()[:15], 16) % (_BOOT_P - 1) + 1
        bucket = (h1 + r.b * h2) % _BOOT_P % _BOOT_MOD
        assert r.bucket == bucket
        w = sum(bucket >= t for t in _POIS_T)
        assert 0 <= w <= len(_POIS_T)
    # stride stays exact BIGINT territory in both engines
    assert 63 * (_BOOT_P - 1) < 2 ** 63


def test_bootstrap_ci_brackets_the_point_estimate(spark):
    row = bootstrap_revenue_ci(spark, SF_DIR).collect()[0]
    assert row.n_replicates == 64
    assert row.ci_lo <= row.mean_value <= row.ci_hi
    assert row.ci_lo < row.ci_hi
    # Poisson thresholds: monotone, start at ~e^-1, weights 0..7
    assert _POIS_T[0] == round(math.exp(-1) * _BOOT_MOD)
    assert all(a < b for a, b in zip(_POIS_T, _POIS_T[1:]))


def test_conformal_split_partition_and_coverage(spark):
    from threat_detection_nosql_spark.sources.readers import load_table
    row = conformal_price_threshold(spark, SF_DIR).collect()[0]
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert row.n_train + row.n_cal + row.n_test == n_orders
    assert row.n_train > row.n_cal > 0 and row.n_test > 0
    assert row.qhat_value > 0
    assert row.target == 0.9
    # the distribution-free guarantee is E[coverage] >= 0.9; allow
    # finite-sample slack on the held-out split
    assert 0.85 <= row.coverage <= 1.0


def test_vocab_richness_estimators(spark):
    """Chao1 >= observed V (it's a lower-bound ADDITION), Good-Turing
    mass in (0,1), and the frequency-of-frequency identities hold."""
    from threat_detection_nosql_spark.queries.corpus import (
        vocab_richness_report,
    )
    rows = vocab_richness_report(spark, SF_DIR).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r.chao1_vocab >= r.v_observed
        # == 0.0 is legal: a source with no singleton tokens
        assert 0.0 <= r.gt_unseen_mass < 1.0
        assert r.n1 + 2 * r.n2 <= r.n_tokens
        assert r.n1 + r.n2 <= r.v_observed
        if r.n2 > 0:
            expect = r.v_observed + r.n1 * r.n1 / (2.0 * r.n2)
            assert abs(r.chao1_vocab - expect) < 1e-5


def test_group_kfold_is_a_user_partition(spark):
    """Every user's events land in exactly one fold, and the folds
    cover the whole fact table."""
    from threat_detection_nosql_spark.queries.corpus import (
        _KFOLD_K,
        group_kfold_assignment,
    )
    from threat_detection_nosql_spark.sources.readers import load_table
    rows = group_kfold_assignment(spark, SF_DIR).collect()
    assert [r.fold for r in rows] == list(range(_KFOLD_K))
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    assert sum(r.n_users for r in rows) == \
        ev.select("user_id").distinct().count()
    assert abs(sum(r.event_share for r in rows) - 1.0) < 1e-4


def test_cuped_reduces_variance_and_replays_theta(spark):
    """theta/lifts re-derived in pure Python from the per-user frame
    must match; CUPED must not move the lift when the covariate is
    balanced (it is, by hash randomization) by more than the
    adjustment magnitude allows."""
    from threat_detection_nosql_spark.operators.sampling import (
        hash_bucket,
    )
    from threat_detection_nosql_spark.queries.metrics import (
        cuped_adjusted_lift,
    )
    from threat_detection_nosql_spark.sources.readers import load_table
    ev = load_table(spark, SF_DIR, "events")
    users = (ev.groupBy("user_id")
             .agg(F.count("*").alias("y"),
                  F.sum((F.col("event_type") == "click").cast("long"))
                  .alias("x"))
             .select("x", "y",
                     (hash_bucket(F.col("user_id"), salt="exp") % 2)
                     .alias("v"))).collect()
    n = len(users)
    sx = sum(r.x for r in users); sy = sum(r.y for r in users)
    sxy = sum(r.x * r.y for r in users)
    sxx = sum(r.x * r.x for r in users)
    syy = sum(r.y * r.y for r in users)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx)
                                     * (n * syy - sy * sy))
    out = cuped_adjusted_lift(spark, SF_DIR).collect()[0]
    assert out.n_users_a + out.n_users_b == n
    assert abs(out.theta - theta) < 1e-5
    assert abs(out.var_reduction - r2) < 1e-5
    assert 0.0 <= out.var_reduction <= 1.0
    ya = [r.y for r in users if r.v == 0]
    yb = [r.y for r in users if r.v == 1]
    raw = sum(yb) / len(yb) - sum(ya) / len(ya)
    assert abs(out.raw_lift - raw) < 1e-5


def test_containment_catches_subset_docs_jaccard_misses(spark):
    """Every emitted pair really overlaps at >= the threshold, the
    coefficient is the overlap of the PRUNED shingle sets, and the
    asymmetric case exists: some emitted pair has a length gap big
    enough that its Jaccard is far below its containment."""
    from threat_detection_nosql_spark.queries.pipeline import (
        _CONT_MIN,
        containment_near_dups,
    )
    rows = containment_near_dups(spark, SF_DIR).collect()
    assert rows, "sf0.01 has containment pairs"
    for r in rows:
        assert r.overlap_coef >= _CONT_MIN
        assert r.n_inter <= min(r.n_a, r.n_b)
        assert r.doc_a < r.doc_b
        expect = r.n_inter / min(r.n_a, r.n_b)
        assert abs(r.overlap_coef - expect) < 1e-6
    jac = lambda r: r.n_inter / (r.n_a + r.n_b - r.n_inter)  # noqa: E731
    # containment dominates Jaccard, strictly on any size-asymmetric
    # pair — the reason the operator exists
    assert all(r.overlap_coef >= jac(r) - 1e-6 for r in rows)
    assert any(r.n_a != r.n_b and r.overlap_coef > jac(r) + 1e-6
               for r in rows), "no size-asymmetric pair found"


def test_mmr_matches_driver_side_greedy_and_diversifies(spark):
    """(1) The distributed applyInPandas greedy must equal a
    driver-side greedy run on the same collected candidate frame —
    pins the Arrow/grouping mechanics and determinism. (2) MMR's
    raison d'etre: the selected set is no more self-similar than the
    plain relevance top-10, strictly less for at least one query."""
    import numpy as np

    from threat_detection_nosql_spark.queries.pipeline import (
        _MMR_TOPN,
        _MMR_W_REL,
        _MMR_W_SIM,
        mmr_diversified_topk,
    )
    from threat_detection_nosql_spark.sources.readers import load_table

    out = mmr_diversified_topk(spark, SF_DIR).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    assert sorted(by_q) == list(range(8))

    emb = {r.vec_id: np.array(r.embedding, dtype="float64")
           for r in load_table(spark, SF_DIR, "embeddings").collect()}

    def seq_norm(v):  # fold-left like the JVM aggregate
        acc = 0.0
        for x in v:
            acc = acc + x * x
        return np.sqrt(acc)

    def seq_dot(a, b):  # dimension-ordered, matching kernel + oracle
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def round_half_away(x, nd=6):  # Spark F.round, not banker's
        s = 10.0 ** nd
        return np.copysign(np.floor(abs(x) * s + 0.5), x) / s

    unit = {k: v / seq_norm(v) for k, v in emb.items()}

    tighter = 0
    for q, rows in by_q.items():
        rows = sorted(rows, key=lambda r: r.mmr_rank)
        assert [r.mmr_rank for r in rows] == list(range(1, _MMR_TOPN + 1))
        assert len({r.item_id for r in rows}) == _MMR_TOPN
        # driver-side greedy over the same round-6 relevance candidates,
        # accumulating every dot in DIMENSION ORDER with half-away
        # rounding — bit-matching the kernel/oracle convention so the
        # exact-pick assertion cannot flake on BLAS summation order
        cand = sorted(((round_half_away(seq_dot(unit[q], unit[i])), i)
                       for i in unit if i != q),
                      key=lambda t: (-t[0], t[1]))[:50]
        cand.sort(key=lambda t: t[1])
        ids = [i for _, i in cand]
        rel_ppb = np.floor(np.array([s for s, _ in cand]) * 1e9)\
            .astype(np.int64)
        V = np.stack([unit[i] for i in ids])
        sims = np.zeros((len(ids), len(ids)))
        for dd in range(V.shape[1]):
            sims = sims + np.outer(V[:, dd], V[:, dd])
        sim_ppb = np.floor(sims * 1e9).astype(np.int64)
        chosen = []
        max_sim = np.zeros(len(ids), dtype=np.int64)
        for _ in range(_MMR_TOPN):
            mmr = _MMR_W_REL * rel_ppb - _MMR_W_SIM * max_sim
            mmr[chosen] = np.iinfo(np.int64).min
            pick = int(np.argmax(mmr))
            chosen.append(pick)
            max_sim = np.maximum(max_sim, sim_ppb[:, pick])
        assert [r.item_id for r in rows] == [ids[p] for p in chosen]
        # rank 1 is the pure-relevance argmax (id tie-break)
        assert rows[0].item_id == min(
            (i for s, i in cand if s == max(s for s, _ in cand))), q
        # diversity: mean pairwise sim of MMR picks <= plain top-10's
        def mean_sim(items):
            M = np.stack([unit[i] for i in items])
            S = M @ M.T
            n = len(items)
            return (S.sum() - np.trace(S)) / (n * (n - 1))
        plain = [i for _, i in sorted(
            ((s, i) for s, i in cand), key=lambda t: (-t[0], t[1]))[:10]]
        m_mmr = mean_sim([r.item_id for r in rows])
        m_plain = mean_sim(plain)
        assert m_mmr <= m_plain + 1e-9
        if m_mmr < m_plain - 1e-9:
            tighter += 1
    assert tighter >= 1, "MMR never diversified — fixture degenerate"


def test_kaplan_meier_python_rederivation(spark):
    """Recompute the KM curve in pure Python from the raw events
    (durations, censoring, the product-limit formula) and compare
    every emitted row; plus the estimator's shape invariants."""
    from collections import Counter

    from threat_detection_nosql_spark.queries.temporal import (
        kaplan_meier_conversion,
    )
    from threat_detection_nosql_spark.sources.readers import load_table

    ev = (load_table(spark, SF_DIR, "events")
          .select("user_id", "ts", "event_type", "value").collect())
    first: dict = {}; last: dict = {}; purch: dict = {}
    for r in ev:
        u = r.user_id
        first[u] = min(first.get(u, r.ts), r.ts)
        last[u] = max(last.get(u, r.ts), r.ts)
        if r.event_type == "purchase" and r.value >= 150:
            purch[u] = min(purch.get(u, r.ts), r.ts)
    subj = []
    for u in first:
        end = purch.get(u, last[u])
        hours = int((end - first[u]).total_seconds() // 3600)
        subj.append((hours, u in purch))
    d = Counter(t for t, c in subj if c)
    cens = Counter(t for t, c in subj if not c)
    rows = kaplan_meier_conversion(spark, SF_DIR).collect()
    assert rows[0].n_risk == len(subj)
    n_risk = len(subj)
    s = 1.0
    expect = {}
    for t in sorted(set(d) | set(cens)):
        if d[t] > 0:
            s *= 1.0 - d[t] / n_risk
        expect[t] = (n_risk, d[t], cens[t], s)
        n_risk -= d[t] + cens[t]
    assert len(rows) == len(expect)
    prev = 1.0 + 1e-12
    for r in rows:
        en, ed, ec, es = expect[r.t_hours]
        assert (r.n_risk, r.n_events, r.n_censored) == (en, ed, ec)
        assert abs(r.survival - es) < 1e-5
        assert r.survival <= prev  # monotone non-increasing
        prev = r.survival
    assert any(r.n_censored > 0 for r in rows), \
        "no censoring at this SF — fixture degenerate"
    assert rows[-1].survival < 1.0


def test_mann_whitney_python_rederivation(spark):
    """Recompute U, the tie-corrected z and the rank-biserial r with
    textbook average ranks in pure Python and compare."""
    from collections import Counter

    from threat_detection_nosql_spark.operators.sampling import (
        hash_bucket,
    )
    from threat_detection_nosql_spark.queries.metrics import (
        mann_whitney_variant_test,
    )
    from threat_detection_nosql_spark.sources.readers import load_table

    ev = load_table(spark, SF_DIR, "events")
    users = (ev.groupBy("user_id").agg(F.count("*").alias("y"))
             .select("y", (hash_bucket(F.col("user_id"), salt="exp") % 2)
                     .alias("v"))).collect()
    n = len(users)
    counts = Counter(r.y for r in users)
    avg_rank, cum = {}, 0
    for y in sorted(counts):
        avg_rank[y] = cum + (counts[y] + 1) / 2
        cum += counts[y]
    b = [r.y for r in users if r.v == 1]
    nb, na = len(b), n - len(b)
    rb = sum(avg_rank[y] for y in b)
    u = rb - nb * (nb + 1) / 2
    ties = sum(t ** 3 - t for t in counts.values())
    var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - na * nb / 2) / math.sqrt(var)
    out = mann_whitney_variant_test(spark, SF_DIR).collect()[0]
    assert (out.n_a, out.n_b) == (na, nb)
    assert abs(out.u_stat - u) < 1e-6
    assert abs(out.z_score - z) < 1e-5
    assert abs(out.rank_biserial - (1 - 2 * u / (na * nb))) < 1e-6
    assert -1.0 <= out.rank_biserial <= 1.0
    # hash assignment is a fair coin: |z| should not scream
    assert abs(out.z_score) < 5.0
    assert ties > 0, "integer metric must produce ties"


def test_ks_split_drift_exact_integer_supremum(spark):
    """Recompute the two-sample KS distance in pure Python from the
    hash-split length lists and compare; a hash split must sit well
    under the 5% critical value (that's the audit's point)."""
    from threat_detection_nosql_spark.operators.sampling import (
        hash_bucket,
    )
    from threat_detection_nosql_spark.queries.cleaning import (
        ks_split_drift,
    )
    from threat_detection_nosql_spark.sources.readers import load_table

    docs = (load_table(spark, SF_DIR, "documents")
            .select(F.length("text").alias("len"),
                    hash_bucket(F.col("doc_id"), salt="split-ks")
                    .alias("b"))).collect()
    a = sorted(r.len for r in docs if r.b < 5000)
    b = sorted(r.len for r in docs if r.b >= 5000)
    na, nb = len(a), len(b)
    best, best_len = -1, None
    ca = cb = 0
    import bisect
    for ln in sorted(set(a) | set(b)):
        ca = bisect.bisect_right(a, ln)
        cb = bisect.bisect_right(b, ln)
        gap = abs(ca * nb - cb * na)
        if gap > best:
            best, best_len = gap, ln
    row = ks_split_drift(spark, SF_DIR).collect()[0]
    assert (row.n_half_a, row.n_half_b) == (na, nb)
    assert row.ks_at_len == best_len
    assert abs(row.ks_stat - best / (na * nb)) < 1e-6
    assert 0.0 <= row.ks_stat <= 1.0
    assert row.ks_stat < row.crit_05, \
        "hash split shows significant drift — split machinery broken"


def test_tokenizer_fertility_identities(spark):
    """Fertility >= ~1 on whitespace-split ASCII text (the regex never
    merges across spaces), byte/token and token/word ratios positive,
    and the group sums reconcile with a direct corpus count."""
    from threat_detection_nosql_spark.queries.tokenizer import (
        tokenizer_fertility,
    )
    from threat_detection_nosql_spark.sources.readers import load_table

    rows = tokenizer_fertility(spark, SF_DIR).collect()
    assert rows
    docs = load_table(spark, SF_DIR, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.fertility >= 1.0  # a word is >= 1 subword
        assert r.bytes_per_token > 0
        assert r.n_subwords >= r.n_words
        assert abs(r.fertility - r.n_subwords / r.n_words) < 1e-6


def test_incremental_dedup_planted_classification(spark, tmp_path):
    """Planted batch: an incoming doc that is a case/whitespace
    variant of a corpus doc -> exact_dup; one word changed -> near_dup
    (band collision + >=8/16 agreement); unrelated text -> unique.
    Batch membership is the portable hash of doc_id, so the fixture
    picks ids on the right side of the split programmatically."""
    from threat_detection_nosql_spark.queries.advanced import (
        incremental_corpus_dedup,
    )

    def bucket(i):
        return int(hashlib.md5(f"batch:{i}".encode())
                   .hexdigest()[:15], 16) % 10000

    olds = [i for i in range(400) if bucket(i) < 8000]
    news = [i for i in range(400) if bucket(i) >= 8000]
    assert len(olds) >= 2 and len(news) >= 3
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu")
    near = base.replace("oscar", "OSCARX")  # one shingle neighborhood
    rows = [
        (olds[0], base, "en", "src0", len(base)),
        (olds[1], "completely different text " * 6, "en", "src0", 1),
        (news[0], "  " + base.upper() + "  ", "en", "src0", 1),  # exact
        (news[1], near, "en", "src0", 1),                        # near
        (news[2], "zeta eta theta iota kappa " * 8, "en", "src0", 1),
    ]
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .coalesce(1).write.mode("overwrite")
     .parquet(str(tmp_path / "documents.parquet")))
    got = {r.doc_id: (r.status, r.matched_old)
           for r in incremental_corpus_dedup(spark, str(tmp_path))
           .collect()}
    assert got[news[0]] == ("exact_dup", olds[0])
    assert got[news[1]] == ("near_dup", olds[0])
    assert got[news[2]] == ("unique", None)
    assert set(got) == {news[0], news[1], news[2]}


def test_stream_incremental_dedup_two_batch_parity(spark, tmp_path):
    """Two incoming micro-batches of planted docs against a static
    corpus: the drained match table must equal the batch screen —
    every match row is a pure function of one arriving row, so
    batching cannot change the min-agg."""
    import os
    import time

    from threat_detection_nosql_spark.streaming.stream_queries import (
        dedup_matches_agg,
        run_stream_to_table,
    )

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu")
    other = ("ein zwei drei vier funf sechs sieben acht neun zehn "
             "elf zwolf dreizehn vierzehn funfzehn sechzehn siebzehn "
             "achtzehn neunzehn zwanzig einund zweiund dreiund vierund")
    old_rows = [(0, base), (1, other)]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    batch1 = [(100, base.replace("oscar", "OSCARX")),   # near of 0
              (101, "unrelated words entirely " * 8)]   # unique
    batch2 = [(102, other.replace("neun ", "NEUN9 ")),  # near of 1
              (103, base)]                              # identical to 0
    src = tmp_path / "feed"
    os.makedirs(src)
    for name, rows in [("b1.parquet", batch1), ("b2.parquet", batch2)]:
        (spark.createDataFrame(rows, "doc_id long, text string")
         .coalesce(1).write.parquet(str(src / name)))
        time.sleep(1.1)  # file source processes in mtime order
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "*.parquet")))
    table = run_stream_to_table(dedup_matches_agg(stream, old),
                                mode="complete")
    got = {r.doc_id: r.matched_old for r in table.collect()}
    # batch reference: the same plan over the union read as one batch
    batch_df = spark.createDataFrame(batch1 + batch2,
                                     "doc_id long, text string")
    want = {r.doc_id: r.matched_old
            for r in dedup_matches_agg(batch_df, old).collect()}
    assert got == want
    assert got[100] == 0 and got[102] == 1 and got[103] == 0
    assert 101 not in got


def test_regression_metrics_python_rederivation(spark):
    """MAE/RMSE/R^2 recomputed in pure Python from the raw split."""
    from threat_detection_nosql_spark.queries.metrics import (
        regression_metrics_report,
    )
    from threat_detection_nosql_spark.sources.readers import load_table

    rows = (load_table(spark, SF_DIR, "orders")
            .select("o_orderkey", "o_orderpriority", "o_totalprice")
            .collect())
    def bucket(k):
        return int(hashlib.md5(f"conf:{k}".encode())
                   .hexdigest()[:15], 16) % 10000
    train, test = [], []
    for r in rows:
        cents = round(r.o_totalprice * 100)
        b = bucket(r.o_orderkey)
        if b < 6000:
            train.append((r.o_orderpriority, cents))
        elif b >= 8000:
            test.append((r.o_orderpriority, cents))
    pred: dict = {}
    for pri in {p for p, _ in train}:
        xs = [c for p, c in train if p == pri]
        pred[pri] = sum(xs) / len(xs)
    resid = [(c - pred[p]) / 100.0 for p, c in test]
    n = len(resid)
    mae = sum(round(abs(r) * 1e4) for r in resid) / 1e4 / n
    sse = sum(round(r * r * 1e4) for r in resid) / 1e4
    ys = [c / 100.0 for _, c in test]
    mean_y = sum(ys) / n
    tss = sum((y - mean_y) ** 2 for y in ys)
    out = regression_metrics_report(spark, SF_DIR).collect()[0]
    assert out.n_test == n
    assert abs(out.mae - mae) < 1e-4
    assert abs(out.rmse - math.sqrt(sse / n)) < 1e-4
    assert abs(out.r2 - (1 - sse / tss)) < 1e-4
    # the per-priority mean has to beat predicting the global mean
    assert 0.0 <= out.r2 < 1.0 or out.r2 > -0.05
