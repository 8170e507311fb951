"""Round-9 additions: t-SNE-substitute neighbor embedding."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_tsne_substitute_contracts_neighborhoods(spark):
    """The smoothing must (a) keep every user, (b) be deterministic at
    output rounding, and (c) contract local neighborhoods: mean 5-NN
    distance in the embedded plane is strictly smaller than in the
    PCA initialization (that contraction is the local-structure
    emphasis the substitute exists for)."""
    import math

    from threat_detection_nosql_spark.queries.ml_queries import (
        _TSNE_K, tsne_substitute_projection, user_pca_projection)

    init = {r.user: (r.pc1, r.pc2)
            for r in user_pca_projection(spark, SF).collect()}
    out = {r.user: (r.x, r.y)
           for r in tsne_substitute_projection(spark, SF).collect()}
    out2 = {r.user: (r.x, r.y)
            for r in tsne_substitute_projection(spark, SF).collect()}
    assert set(out) == set(init)
    assert all(abs(out[u][0] - out2[u][0]) < 1e-4
               and abs(out[u][1] - out2[u][1]) < 1e-4 for u in out)

    def mean_knn(coords):
        tot = 0.0
        for u, (x, y) in coords.items():
            ds = sorted(math.hypot(x - a, y - b)
                        for v, (a, b) in coords.items() if v != u)
            tot += sum(ds[:_TSNE_K]) / _TSNE_K
        return tot / len(coords)

    assert mean_knn(out) < mean_knn(init)
