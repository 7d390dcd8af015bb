"""Toy-fixture pins for the event-time and corpus-pipeline operators
(q45 as-of join, q46 sessionization, q47 tf-idf, q48 scrub, q49 sampling).
The sf0.01 value checks live in the driver oracles; these tests pin the
SEMANTICS on inputs small enough to verify by hand."""

import datetime as dt

import pandas as pd
import pytest

from tzspark.queries_text import (
    q45_asof_join,
    q46_sessionize,
    q47_tfidf_topterms,
    q48_pii_scrub,
    q49_stratified_sample,
)


def _write_events(spark, tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["props"] = "{}"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    return str(tmp_path)


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


def test_asof_join_semantics(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            # user 1: click at :05, purchases at :03 (before any click -> no
            # match), :05 (equal ts -> at-or-before matches), :30 (matches)
            (10, _ts(5), 1, "click", 1.5),
            (11, _ts(3), 1, "purchase", 9.0),
            (12, _ts(5), 1, "purchase", 9.5),
            (13, _ts(30), 1, "purchase", 9.9),
            # user 2: two clicks; purchase takes the LATEST preceding one
            (20, _ts(1), 2, "click", 2.0),
            (21, _ts(7), 2, "click", 2.5),
            (22, _ts(8), 2, "purchase", 8.0),
            # noise the operator must ignore
            (30, _ts(2), 1, "view", 0.1),
        ],
    )
    got = {
        r["event_id"]: (r["asof_event"], r["asof_value"])
        for r in q45_asof_join(spark, sf).collect()
    }
    assert got == {
        11: (-1, 0.0),     # purchase before any click
        12: (10, 1.5),     # equal-ts click is visible (at-or-before)
        13: (10, 1.5),
        22: (21, 2.5),     # latest preceding click wins
    }


def test_asof_equal_ts_click_wins(spark, tmp_path):
    # (user_id, ts) collision between a click and a purchase: the click
    # sorts first (side ordering), so the purchase sees it.
    sf = _write_events(
        spark, tmp_path,
        [(1, _ts(5), 7, "click", 3.0), (2, _ts(5), 7, "purchase", 1.0)],
    )
    row = q45_asof_join(spark, sf).collect()[0]
    assert (row["asof_event"], row["asof_value"]) == (1, 3.0)


def test_sessionize_gap_splits(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            # user 1: 0, +10 min (same session), +40 (new), +50 (new)
            (1, _ts(0), 1, "view", 1.0),
            (2, _ts(10), 1, "click", 2.0),
            (3, _ts(50), 1, "purchase", 3.0),
            (4, dt.datetime(2024, 1, 1, 2, 20), 1, "view", 4.0),
            # user 2: single event
            (5, _ts(0), 2, "view", 5.0),
        ],
    )
    rows = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["n_purchases"])
        for r in q46_sessionize(spark, sf).collect()
    }
    assert rows == {
        (1, 1): (2, 0),
        (1, 2): (1, 1),
        (1, 3): (1, 0),
        (2, 1): (1, 0),
    }


def test_sessionize_exact_boundary_not_split(spark, tmp_path):
    # gap of EXACTLY 30:00.000000 is not > the threshold -> same session
    sf = _write_events(
        spark, tmp_path,
        [(1, _ts(0), 1, "view", 1.0), (2, _ts(30), 1, "view", 1.0),
         (3, _ts(30, 0, 1), 1, "view", 1.0)],  # +1 us past an exact gap
    )
    rows = q46_sessionize(spark, sf).collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 3


def _write_docs(spark, tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["source"] = "t"
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def test_tfidf_ranking_and_score(spark, tmp_path):
    import math

    sf = _write_docs(
        spark, tmp_path,
        [(1, "a a a b b c", "en"), (2, "b b b b z z c", "en")],
    )
    out = q47_tfidf_topterms(spark, sf).collect()
    r = {(x["doc_id"], x["rank"]): (x["token"], x["tf"], x["df"]) for x in out}
    # doc 1: a(3), b(2), c(1); doc 2: b(4), z(2), c(1)
    assert r[(1, 1)] == ("a", 3, 1) and r[(1, 2)] == ("b", 2, 2)
    assert r[(2, 1)] == ("b", 4, 2) and r[(2, 2)] == ("z", 2, 1)
    sc = {(x["doc_id"], x["token"]): x["tfidf"] for x in out}
    assert sc[(1, "a")] == pytest.approx(3 * math.log(2.0 / 1), rel=1e-12)
    assert sc[(2, "b")] == pytest.approx(4 * math.log(2.0 / 2), abs=1e-12)


def test_pii_scrub_redacts(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [(777, "hello world", "en")])
    row = q48_pii_scrub(spark, sf).collect()[0]
    assert row["n_emails"] == 1 and row["n_phones"] == 1
    # scrubbing is idempotent: the md5 equals md5 of the expected plain text
    import hashlib

    want = "hello world contact <EMAIL> or <PHONE>"
    assert row["scrubbed_md5"] == hashlib.md5(want.encode()).hexdigest()


def test_stratified_sample_threshold_and_determinism(spark, tmp_path):
    import hashlib

    rows = [(i, f"doc {i}", "en" if i % 2 == 0 else "fr") for i in range(200)]
    sf = _write_docs(spark, tmp_path, rows)
    kept = sorted(r["doc_id"] for r in q49_stratified_sample(spark, sf).collect())
    want = sorted(
        i for i, _, lang in rows
        if hashlib.md5(str(i).encode()).hexdigest()[:2]
        < ("80" if lang == "en" else "33")
    )
    assert kept == want
    # and the en stratum keeps roughly 2.5x the fr stratum
    n_en = sum(1 for i in kept if i % 2 == 0)
    n_fr = len(kept) - n_en
    assert n_en > n_fr


def test_chunking_boundaries(spark, tmp_path):
    from tzspark.queries_text import q50_chunk_documents

    sf = _write_docs(
        spark, tmp_path,
        [
            (1, " ".join(["w"] * 32), "en"),   # exactly one window
            (2, " ".join(["w"] * 33), "en"),   # one token over -> 2 chunks
            (3, " ".join(["w"] * 80), "en"),   # (80-32+23)//24+1 = 3 chunks
            (4, "only four tokens here", "en"),  # shorter than size
        ],
    )
    rows = q50_chunk_documents(spark, sf).collect()
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["n_chunk_tokens"]))
    for v in per.values():
        v.sort()
    assert per[1] == [(0, 32)]
    assert per[2] == [(0, 32), (1, 9)]      # tail window: tokens 25..33
    assert per[3] == [(0, 32), (1, 32), (2, 32)]  # tokens 49..80
    assert per[4] == [(0, 4)]


def test_sequence_pack_offsets(spark, tmp_path):
    from tzspark.queries_text import q51_sequence_pack

    sf = _write_docs(
        spark, tmp_path,
        [
            (1, " ".join(["w"] * 2000), "en"),  # off 0, ends in seq 0
            (2, " ".join(["w"] * 100), "en"),   # off 2000, spills into seq 1
            (3, " ".join(["w"] * 10), "en"),    # off 2100 -> seq 1
            (4, " ".join(["w"] * 5), "fr"),     # separate lang stream
        ],
    )
    r = {x["doc_id"]: (x["seq_start"], x["seq_end"], x["off_in_seq"])
         for x in q51_sequence_pack(spark, sf).collect()}
    assert r[1] == (0, 0, 0)
    assert r[2] == (0, 1, 2000)   # crosses the 2048 boundary
    assert r[3] == (1, 1, 52)
    assert r[4] == (0, 0, 0)


def test_repetition_signals_crafted(spark, tmp_path):
    """q78 fractions pinned by hand: an all-unique doc scores 0/low and is
    kept; a one-bigram loop doc scores high on both signals and is flagged;
    a single-token doc (no bigram) gets top_bigram_frac 0."""
    from tzspark.queries_text import q78_repetition_signals

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b c d e f g h i j k l", "en"),  # 12 tokens, all distinct
            (2, "x y x y x y x y", "en"),  # 'x y' bigram 4x of 7 bigrams
            (3, "solo", "en"),  # 1 token: no bigrams at all
        ],
    )
    out = q78_repetition_signals(spark, sf).toPandas().set_index("doc_id")
    r1, r2, r3 = out.loc[1], out.loc[2], out.loc[3]
    assert r1["n_tokens"] == 12 and r1["dup_token_frac"] == 0.0
    # doc1's top bigram occurs once: coverage 2/12, under the 0.20 gate
    assert round(r1["top_bigram_frac"], 6) == round(2 / 12, 6) and not r1["repetitive"]
    # doc2: 2 distinct of 8 tokens -> dup 0.75; 'x y' occurs 4x -> 2*4/8 = 1.0
    assert r2["dup_token_frac"] == 0.75
    assert r2["top_bigram_frac"] == 1.0 and bool(r2["repetitive"])
    assert r3["n_tokens"] == 1 and r3["top_bigram_frac"] == 0.0
    assert not r3["repetitive"]


def test_mix_interleave_stride_schedule(spark, tmp_path):
    """q85: a weight-w source must land w docs per unit of key space,
    interleaved by stride — pinned on a crafted two-source corpus."""
    from tzspark.queries_text import q85_mix_interleave

    rows = [(i, f"doc {i}", "en") for i in range(12)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    # src1 -> weight 2, src2 -> weight 3 (1 + src_num % 4)
    pdf["source"] = ["src1"] * 6 + ["src2"] * 6
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = q85_mix_interleave(spark, str(tmp_path)).toPandas()
    assert len(out) == 12
    # pos_key is (r - 0.5) / weight exactly
    assert (
        out["pos_key"] == ((out["r"] - 0.5) / out["weight"]).round(6)
    ).all()
    assert set(out[out["source"] == "src1"]["weight"]) == {2}
    assert set(out[out["source"] == "src2"]["weight"]) == {3}
    # stride property: among keys <= 1.0, weight-2 source has 2 docs,
    # weight-3 source has 3
    head = out[out["pos_key"] <= 1.0]
    assert head.groupby("source").size().to_dict() == {"src1": 2, "src2": 3}
    # rows arrive sorted by the schedule
    assert out["pos_key"].is_monotonic_increasing
    # per-source rank is a 1..n permutation (no gaps, hash order total)
    for _s, g in out.groupby("source"):
        assert sorted(g["r"]) == list(range(1, len(g) + 1))


def test_countmin_matches_reference_sketch(spark, tmp_path):
    """q86: the sketch estimate equals a hand-built count-min over the same
    md5 bucketing, and never under-estimates (the CMS one-sided bound)."""
    import hashlib
    from collections import Counter

    from tzspark.queries_text import _CMS_DEPTH, q86_countmin_tokens

    texts = ["a a a a b", "b c c d e", "a e e e f g", "h h i j k l m n"]
    sf = _write_docs(
        spark, tmp_path, [(i, t, "en") for i, t in enumerate(texts)]
    )
    out = q86_countmin_tokens(spark, str(tmp_path)).toPandas()
    toks = Counter(w for t in texts for w in t.split(" "))

    def bucket(d, t):
        return hashlib.md5(f"{d}:{t}".encode()).hexdigest()[:2]

    cells = Counter()
    for t, n in toks.items():
        for d in range(_CMS_DEPTH):
            cells[(d, bucket(d, t))] += n
    assert len(out) == len(toks)  # fewer than top-k distinct tokens
    for _, r in out.iterrows():
        want = min(cells[(d, bucket(d, r["token"]))] for d in range(_CMS_DEPTH))
        assert r["est_n"] == want
        assert r["est_n"] >= r["exact_n"] == toks[r["token"]]
        assert r["over"] == r["est_n"] - r["exact_n"]


def test_bm25_hand_computed(spark, tmp_path):
    """q90: score pinned against a by-hand BM25 on a 3-doc corpus."""
    import math

    from tzspark.queries_text import _BM25_B, _BM25_K1, q90_bm25_rank

    texts = {
        1: "hash join hash probe",     # hash tf=2, join tf=1, dl=4
        2: "filter scan scan scan",    # filter tf=1, dl=4
        3: "slow slow slow slow slow slow slow nothing",  # slow tf=7, dl=8
    }
    sf = _write_docs(
        spark, tmp_path, [(i, t, "en") for i, t in texts.items()]
    )
    out = {r["doc_id"]: r["bm25"] for r in q90_bm25_rank(spark, str(tmp_path)).collect()}
    n, avgdl = 3.0, (4 + 4 + 8) / 3.0

    def bm25(pairs, dl):
        s = 0.0
        for tf, df in pairs:
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * (_BM25_K1 + 1) / (
                tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / avgdl)
            )
        return round(s, 6)

    assert out[1] == pytest.approx(bm25([(2, 1), (1, 1)], 4), abs=1e-6)
    assert out[2] == pytest.approx(bm25([(1, 1)], 4), abs=1e-6)
    assert out[3] == pytest.approx(bm25([(7, 1)], 8), abs=1e-6)
