"""Product quantization (queries/advanced.py PQ section): NumPy
replay of the fixed-Lloyd codebooks at sf0.001 verifies the trainer,
the ADC scores, and the top-k; a plan pin keeps the LUT join
broadcast."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMALL
from threat_detection_nosql_spark.queries import advanced


@pytest.fixture(scope="module")
def emb_np(spark):
    from threat_detection_nosql_spark.sources.readers import load_table
    rows = (load_table(spark, SF_SMALL, "embeddings")
            .select("vec_id", "embedding").collect())
    ids = np.array([r["vec_id"] for r in rows])
    order = np.argsort(ids)
    return ids[order], np.array(
        [rows[i]["embedding"] for i in order], dtype=np.float64)


def _lloyd_np(sub: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """NumPy twin of operators/clustering.kmeans_fixed on one
    subspace: seed = k smallest ids, argmin Euclidean with cell-id
    tie-break, per-position mean update."""
    cent = {int(i): sub[ids == i][0] for i in range(k)}

    def assign(c):
        cells = sorted(c)
        d = np.stack([np.linalg.norm(sub - c[cell], axis=1)
                      for cell in cells], axis=1)
        pick = d.argmin(axis=1)  # argmin takes the first = smallest id
        return np.array([cells[p] for p in pick])

    for _ in range(iters):
        a = assign(cent)
        cent = {int(cell): sub[a == cell].mean(axis=0)
                for cell in np.unique(a)}
    return assign(cent), cent


def test_pq_report_matches_numpy(spark, emb_np):
    ids, v = emb_np
    got = {r["subspace"]: r
           for r in advanced.pq_quantization_report(
               spark, SF_SMALL).collect()}
    d = advanced._PQ_DIM
    for m in range(advanced._PQ_M):
        sub = v[:, m * d:(m + 1) * d]
        a, cent = _lloyd_np(sub, ids, advanced._PQ_K, advanced._PQ_ITERS)
        err = np.array([np.linalg.norm(sub[i] - cent[int(a[i])])
                        for i in range(len(ids))])
        r = got[m]
        assert r["n"] == len(ids)
        assert r["n_codes_used"] == len(np.unique(a))
        assert abs(r["mse"] - (err ** 2).mean()) < 1e-5
        assert abs(r["max_dist"] - err.max()) < 1e-5


def test_pq_adc_matches_numpy_topk(spark, emb_np):
    ids, v = emb_np
    d, M = advanced._PQ_DIM, advanced._PQ_M
    codes, cents = [], []
    for m in range(M):
        sub = v[:, m * d:(m + 1) * d]
        a, cent = _lloyd_np(sub, ids, advanced._PQ_K, advanced._PQ_ITERS)
        codes.append(a)
        cents.append(cent)
    got = advanced.pq_adc_topk(spark, SF_SMALL).collect()
    assert len(got) == advanced._N_QUERIES * advanced._PQ_TOPK
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(r)
    idx_of = {int(i): p for p, i in enumerate(ids)}
    for q_id, rows in by_q.items():
        qi = idx_of[q_id]
        adist = {}
        for p, i in enumerate(ids):
            if int(i) == q_id:
                continue
            s = 0.0
            for m in range(M):
                qv = v[qi, m * d:(m + 1) * d]
                cv = cents[m][int(codes[m][p])]
                s += float(((qv - cv) ** 2).sum())
            adist[int(i)] = round(s, 6)
        want = sorted(adist, key=lambda i: (adist[i], i))[
            :advanced._PQ_TOPK]
        rows.sort(key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == want
        for r in rows:
            assert abs(r["adist"] - adist[r["vec_id"]]) < 1e-5


def test_pq_adc_lut_join_is_broadcast(spark):
    plan = (advanced.pq_adc_topk(spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_candidates_only_from_probed_cells(spark):
    """Pruning lives in the join key: every returned neighbor's coarse
    cell must be one of its query's probed cells."""
    from threat_detection_nosql_spark.operators import clustering
    got = advanced.ivfpq_adc_topk(spark, SF_SMALL).collect()
    assert len(got) == advanced._N_QUERIES * advanced._IVF_TOPK
    emb, qs = advanced._emb_and_queries(spark, SF_SMALL)
    assigned, cent = clustering.kmeans_fixed(
        emb, k=advanced._IVF_K, n_iters=advanced._IVF_ITERS)
    cell_of = {r["vec_id"]: r["cell"] for r in
               assigned.select("vec_id", "cell").collect()}
    probed = {}
    for r in clustering.probe_cells(
            cent, qs, n_probe=advanced._IVF_PROBE).collect():
        probed.setdefault(r["q_id"], set()).add(r["cell"])
    for r in got:
        assert cell_of[r["vec_id"]] in probed[r["q_id"]], r
        assert r["adist"] >= 0.0


def test_ivfpq_search_scan_is_partition_pruned(spark):
    """Round-10 split: the registered query searches a PERSISTED
    cell-partitioned index — the codes scan must carry the probed
    cells as PartitionFilters (directory pruning, not a post-filter),
    and the LUT join must broadcast."""
    plan = (advanced.ivfpq_adc_topk(spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())
    pf = [ln for ln in plan.splitlines()
          if "PartitionFilters" in ln and "/codes" in ln]
    assert pf, "codes scan missing"
    assert "ccell" in pf[0].split("PartitionFilters")[1][:80]
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_index_reused_across_invocations(spark):
    """ensure_ivfpq_index is build-once: a second invocation must
    return the same ready path without retraining (marker present,
    same directory), and the search results must be identical."""
    import os
    p1 = advanced.ensure_ivfpq_index(spark, SF_SMALL)
    assert os.path.exists(os.path.join(p1, "_INDEX_READY"))
    p2 = advanced.ensure_ivfpq_index(spark, SF_SMALL)
    assert p1 == p2
    a = sorted(map(tuple, advanced.ivfpq_adc_topk(
        spark, SF_SMALL).collect()))
    b = sorted(map(tuple, advanced.ivfpq_adc_topk(
        spark, SF_SMALL).collect()))
    assert a == b
