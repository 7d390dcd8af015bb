"""SQ8 scalar quantization (queries_text q55/q56).

Pins the encoder bit-exactly against an independent numpy oracle and
measures the quality cost of searching over 4x-compressed codes: the
asymmetric top-3 must be near-identical to q21's exact top-3 (SQ8 with 255
levels loses ~1e-3 of cosine resolution; q21 ranks on 4-decimal-rounded
scores, so agreement is expected to be almost total, and pinned).
"""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _emb_matrix():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    emb = np.vstack(t.column("embedding").to_numpy(zero_copy_only=False))
    return t.column("vec_id").to_numpy(), emb.astype(np.float64)


def _np_sq8(emb):
    """Reference encoder: per-dim min/span, floor((x-mn)*255/span + 0.5)."""
    mn, mx = emb.min(0), emb.max(0)
    span = mx - mn
    safe = np.where(span > 0, span, 1.0)
    codes = np.floor((emb - mn) * 255.0 / safe + 0.5).astype(np.int64)
    codes[:, span <= 0] = 0
    return mn, span, codes


def test_encode_matches_numpy_oracle(spark):
    from tzspark.queries_text import q55_sq8_encode

    vec_id, emb = _emb_matrix()
    _, _, want = _np_sq8(emb)
    got = {
        r["vec_id"]: r["codes"]
        for r in q55_sq8_encode(spark, SF).collect()
    }
    assert len(got) == emb.shape[0]
    for i, v in enumerate(vec_id):
        assert got[int(v)] == ",".join(map(str, want[i]))


def test_codes_fit_uint8(spark):
    from tzspark.queries_text import q55_sq8_encode

    rows = q55_sq8_encode(spark, SF).collect()
    for r in rows:
        cs = [int(c) for c in r["codes"].split(",")]
        assert len(cs) == 64
        assert all(0 <= c <= 255 for c in cs)
    # interior levels actually used (not a degenerate 0/255 quantizer)
    all_codes = {c for r in rows for c in map(int, r["codes"].split(","))}
    assert len(all_codes) > 64


def test_asymmetric_search_recall_vs_exact(spark):
    """Top-3 over dequantized codes vs exact float top-3 (q21): >= 28 of 30
    (probe, cand) hits agree on this corpus — measured 30/30; the slack
    covers rank swaps at quantization-scale score gaps, not real loss."""
    from tzspark.queries_text import q21_ann_bruteforce, q56_sq8_search

    exact = {(r["probe_id"], r["cand_id"]) for r in q21_ann_bruteforce(spark, SF).collect()}
    quant = {(r["probe_id"], r["cand_id"]) for r in q56_sq8_search(spark, SF).collect()}
    assert len(exact) == 30 and len(quant) == 30
    assert len(exact & quant) >= 28


def test_arrow_encode_matches_relational(spark):
    """The packed-binary scale encoder (sq8_encode_arrow) emits the SAME
    codes as the oracle-checked relational q55 encoder."""
    from tzspark.queries_text import _embs, q55_sq8_encode, sq8_encode_arrow, sq8_stats_np

    e = _embs(spark, SF)
    mins, spans = sq8_stats_np(e)
    rel = {r["vec_id"]: r["codes"] for r in q55_sq8_encode(spark, SF).collect()}
    arr = {r["vec_id"]: r["codes"] for r in sq8_encode_arrow(e, mins, spans).collect()}
    assert len(arr) == len(rel)
    for v, blob in arr.items():
        assert len(blob) == 64
        assert ",".join(str(b) for b in blob) == rel[v]


def test_arrow_topk_matches_exact_dequantized(spark):
    """sq8_topk_arrow's distributed local-top-k + window == the true top-k
    over dequantized codes (numpy full-matrix ground truth), scores to
    1e-9 (matmul accumulation order is the only difference)."""
    from tzspark.queries_text import _embs, sq8_encode_arrow, sq8_stats_np, sq8_topk_arrow

    vec_id, emb = _emb_matrix()
    e = _embs(spark, SF)
    mins, spans = sq8_stats_np(e)
    probes = emb[vec_id < 10]
    corpus_mask = vec_id >= 10
    codes_df = sq8_encode_arrow(
        e.where("vec_id >= 10").repartition(4), mins, spans
    )
    got = sq8_topk_arrow(codes_df, mins, spans, probes, k=3).collect()
    assert len(got) == 30
    # ground truth
    mn, span, codes = _np_sq8(emb)
    dec = (mn + codes * np.where(span > 0, span, 1.0) / 255.0)[corpus_mask]
    pn = probes / np.linalg.norm(probes, axis=1, keepdims=True)
    dn = np.linalg.norm(dec, axis=1)
    scores = (dec @ pn.T) / dn[:, None]
    for p in range(len(probes)):
        want = np.sort(scores[:, p])[-3:][::-1]
        have = sorted((r["score"] for r in got if r["probe_idx"] == p), reverse=True)
        assert np.allclose(have, want, atol=1e-9), (p, have, want)


def test_quantization_error_bounded(spark):
    """Reconstruction error per dim <= span/255 (one quantizer step —
    floor(+0.5) rounds to the NEAREST level, so actually span/510 + ulp)."""
    vec_id, emb = _emb_matrix()
    mn, span, codes = _np_sq8(emb)
    dec = mn + codes * np.where(span > 0, span, 1.0) / 255.0
    err = np.abs(dec - emb)
    step = np.where(span > 0, span, 1.0) / 255.0
    assert (err <= step / 2 + 1e-12).all()
