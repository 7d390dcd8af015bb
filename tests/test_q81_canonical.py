"""q81 canonical image dedup: pinned against a brute-force union-find.

The Spark pipeline (aHash -> exact-hash collapse -> banded-LSH pairs ->
pointer-jumping CC -> canon attach) must produce exactly the clusters a
naive all-pairs hamming<=3 union-find over the distinct hashes produces —
banding is pigeonhole-exact at this threshold, so no recall slack.
"""

from tzspark.queries_extra import _AHASH_HAM_MAX, q81_image_dedup_canonical

SF = "/root/testdata/sf0.001"


def _brute_canon(spark):
    from tzspark.imageops import image_ahash
    from tzspark.queries_extra import _images

    ah = (
        image_ahash(_images(spark, SF).select("image_id", "bytes"))
        .select("image_id", "b0", "b1", "b2", "b3")
        .toPandas()
    )
    groups = {}  # hash tuple -> member image ids
    for r in ah.itertuples(index=False):
        groups.setdefault((r.b0, r.b1, r.b2, r.b3), []).append(r.image_id)
    reps = sorted(groups, key=lambda h: min(groups[h]))
    parent = {h: h for h in reps}

    def find(h):
        while parent[h] != h:
            parent[h] = parent[parent[h]]
            h = parent[h]
        return h

    for i, ha in enumerate(reps):
        for hb in reps[i + 1 :]:
            d = sum(bin(a ^ b).count("1") for a, b in zip(ha, hb))
            if d <= _AHASH_HAM_MAX:
                ra, rb = find(ha), find(hb)
                if ra != rb:
                    parent[rb] = ra
    canon = {}
    for h, members in groups.items():
        root = find(h)
        canon.setdefault(root, []).extend(members)
    out = {}
    for members in canon.values():
        c = min(members)
        for m in members:
            out[m] = c
    return out


def test_q81_matches_bruteforce_union_find(spark):
    got = {
        r["image_id"]: (r["canon_id"], r["kept"])
        for r in q81_image_dedup_canonical(spark, SF).collect()
    }
    want = _brute_canon(spark)
    assert set(got) == set(want)  # every image decided exactly once
    for img, (canon, kept) in got.items():
        assert canon == want[img], img
        assert kept == (img == canon)
    # at least one genuine multi-member cluster exists at this SF, or the
    # test proves nothing about merging
    assert len(set(want.values())) < len(want)
