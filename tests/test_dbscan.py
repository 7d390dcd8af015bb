"""covertable.geo_dbscan on planted clusters + role invariants.

The driver query (q57) is value-checked against a DuckDB oracle at sf0.01;
these tests pin the OPERATOR on data with known ground truth: planted dense
blobs must come back as exactly one cluster each, sprinkled isolated points
as noise, and the role semantics (core degree, border adjacency) must hold
row-by-row against a numpy recomputation.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def planted(spark):
    """3 dense blobs (12 pts in ~0.2 deg) + 30 isolated points >= 3 deg
    apart -> expected: 3 clusters, all blob points core/border, rest noise."""
    rng = np.random.default_rng(11)
    rows = []
    centers = [(10.0, 20.0), (-30.0, 65.0), (41.0, -100.0)]
    k = 0
    for clat, clng in centers:
        for _ in range(12):
            rows.append((k, clat + rng.uniform(-0.1, 0.1), clng + rng.uniform(-0.1, 0.1)))
            k += 1
    for i in range(30):
        rows.append((k, -80.0 + i * 5.3 % 160, -170.0 + (i * 37) % 340))
        k += 1
    return spark.createDataFrame(rows, "pid long, lat double, lng double")


def _run(spark, planted):
    from tzspark.covertable import geo_dbscan

    return {
        r["pid"]: (r["role"], r["cluster_id"])
        for r in geo_dbscan(planted, "pid", eps=0.5, min_pts=4, res=8).collect()
    }


def test_planted_blobs_are_exact_clusters(spark, planted):
    got = _run(spark, planted)
    assert len(got) == 66
    # each blob of 12 (diameter <= ~0.28 < eps) is one clique cluster,
    # labeled by its min pid; all members core
    for b in range(3):
        ids = range(b * 12, b * 12 + 12)
        for i in ids:
            role, cid = got[i]
            assert role == "core", (i, role)
            assert cid == b * 12
    # isolated points are noise
    for i in range(36, 66):
        assert got[i] == ("noise", -1), (i, got[i])


def test_roles_match_numpy_recompute(spark, planted):
    got = _run(spark, planted)
    pdf = planted.toPandas().sort_values("pid")
    lat = pdf.lat.to_numpy().astype(np.float32).astype(np.float64)
    lng = pdf.lng.to_numpy().astype(np.float32).astype(np.float64)
    d2 = (lat[:, None] - lat) ** 2 + (lng[:, None] - lng) ** 2
    nbr = (d2 <= 0.25) & ~np.eye(len(lat), dtype=bool)
    core = nbr.sum(1) >= 4
    for i in range(len(lat)):
        role, cid = got[i]
        if core[i]:
            assert role == "core"
        elif (nbr[i] & core).any():
            assert role == "border"
            # min cluster id among core neighbors
            assert cid == min(got[j][1] for j in np.nonzero(nbr[i] & core)[0])
        else:
            assert role == "noise" and cid == -1
