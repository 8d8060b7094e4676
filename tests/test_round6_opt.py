"""Round-6 optimization internals: semdedup's per-cluster union-find
components pass (replacing the distributed label loop — pairs cannot
span k-means clusters, so components are computable per cent_id
group). The sf0.01/sf0.1 oracle gate proves cross-engine exactness on
the driver fixture; this test pins the components SEMANTICS on a
hand-built multi-cluster corpus: several clusters, several distinct
duplicate groups WITHIN one cluster, and group labels at the min id.
"""

from __future__ import annotations

from geotrellis_spark.operators import similarity


def test_semdedup_components_per_cluster_groups(spark):
    """Four well-separated direction groups -> four k-means clusters
    (stride 5 seeds ids 0/5/10/15, one per group). Inside every
    cluster: members 0-2 share vector A, members 3-4 share vector B,
    cos(A, B) ~ 0.735 < the 0.99 threshold — so each cluster holds
    TWO distinct duplicate groups that must NOT merge, and the
    grouped union-find must label each at its min id, per cluster."""
    dim = 64
    rows = []
    for g in range(4):
        va = [0.0] * dim
        va[g] = 1.0
        va[g + 20] = 0.6
        vb = [0.0] * dim
        vb[g] = 1.0
        vb[g + 30] = 0.6
        for m in range(5):
            rows.append((g * 5 + m, [float(x) for x in (va if m < 3 else vb)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in similarity.semdedup(
            emb, threshold_milli=990, stride=5
        ).collect()
    }
    assert len(out) == 20
    for g in range(4):
        base = g * 5
        # every member landed in ONE cluster per group
        cents = {out[base + m]["cent_id"] for m in range(5)}
        assert len(cents) == 1, (g, cents)
        # two duplicate groups inside the cluster, labels at min ids
        assert {out[base + m]["rep"] for m in range(3)} == {base}
        assert {out[base + m]["rep"] for m in (3, 4)} == {base + 3}
        # exactly the two group minima keep
        keeps = [base + m for m in range(5) if out[base + m]["keep"]]
        assert keeps == [base, base + 3]
    # clusters are distinct across groups (components never span them)
    assert len({out[g * 5]["cent_id"] for g in range(4)}) == 4
