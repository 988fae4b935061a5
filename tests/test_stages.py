"""Data-prep stage semantics: dedup, similarity, text, multimodal, scaling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graph_data_science_ray.stages.dedup import (
    SimHasher,
    dedup_exact,
    dedup_minhash_lsh,
    jaccard,
)
from graph_data_science_ray.stages.multimodal import extract_media_features
from graph_data_science_ray.stages.scale import scale_column
from graph_data_science_ray.stages.sessions import sessionize, tumbling_window
from graph_data_science_ray.stages.similarity import (
    embedding_near_dup,
    knn_brute_force,
    knn_lsh,
)
from graph_data_science_ray.stages.text import lang_id, token_count


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


BASE = "the quick brown fox jumps over the lazy dog again and again today"


def test_dedup_exact_keeps_min_doc_id():
    ds = _docs([BASE, "other text entirely", BASE, BASE])
    out = dedup_exact(ds).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1]


def test_minhash_lsh_finds_planted_near_dup():
    near = BASE.replace("lazy", "sleepy")
    far = "completely different words about spark shuffles and ray datasets here"
    docs = [BASE, near, far] + [f"filler document number {i} with random words {i*7}" for i in range(20)]
    ds = _docs(docs)
    out = dedup_minhash_lsh(ds, threshold=0.3).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)
    # reported jaccard equals the exact shingle jaccard
    row = out[(out["doc_a"] == 0) & (out["doc_b"] == 1)].iloc[0]
    assert row["jaccard"] == pytest.approx(jaccard(BASE, near), abs=1e-6)


def test_ngram_jaccard_exact_pairs():
    """Exact similarity join: values match the brute-force shingle
    jaccard; empty docs and sub-threshold pairs are excluded."""
    from graph_data_science_ray.stages.dedup import ngram_jaccard_dedup

    near = BASE.replace("lazy", "sleepy")
    far = "completely different words about spark shuffles and ray datasets here"
    ds = _docs([BASE, near, far, "", "   ", "ab", BASE])
    out = (
        ngram_jaccard_dedup(ds, threshold=0.3).to_pandas()
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pairs = dict(zip(zip(out["doc_a"], out["doc_b"]), out["jaccard"]))
    assert pairs[(0, 1)] == pytest.approx(jaccard(BASE, near), abs=1e-6)
    assert pairs[(0, 6)] == 1.0 and pairs[(1, 6)] == pairs[(0, 1)]
    # empty/whitespace docs emit no shingles -> never pair (jaccard()
    # convention for empty-vs-empty notwithstanding: no rows at all)
    assert all(a not in (3, 4) and b not in (3, 4) for a, b in pairs)
    assert all(2 not in p for p in pairs)
    # short doc (<3 tokens) collapses to one whole-doc shingle: no
    # overlap with anything here
    assert all(5 not in p for p in pairs)
    assert set(pairs) == {(0, 1), (0, 6), (1, 6)}


def test_simhash_similar_docs_have_close_fingerprints():
    near = BASE.replace("lazy", "sleepy")
    far = "completely different words about spark shuffles and ray datasets here"
    df = SimHasher()(pd.DataFrame({"doc_id": [0, 1, 2], "text": [BASE, near, far]}))
    f = df["simhash"].to_numpy(np.uint64)
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(f[0], f[1]) < ham(f[0], f[2])


def test_knn_brute_force_self_neighbors():
    rng = np.random.default_rng(0)
    base = rng.standard_normal((20, 8)).astype(np.float32)
    vecs = np.concatenate([base, base + 1e-4])  # each i has near-twin i+20
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs]),
            }
        )
    )
    res = knn_brute_force(ds, query_ids=np.arange(5), k=1)
    top = res[res["rank"] == 1].set_index("query_id")["neighbor_id"]
    for q in range(5):
        assert top[q] == q + 20


def test_knn_quantized_finds_near_twin():
    """int8-quantized integer top-1 must still resolve each query's
    near-twin, scores must be integer-typed and bounded by 127^2 * dims,
    and the self row must never appear."""
    from graph_data_science_ray.stages.similarity import knn_quantized

    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 8)).astype(np.float32)
    vecs = np.concatenate([base, base + 1e-3])
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs]),
            }
        )
    )
    res = knn_quantized(ds, query_ids=np.arange(5), k=3)
    assert res["score"].dtype == np.int64
    assert (res["score"].abs() <= 127 * 127 * 8).all()
    assert not (res["neighbor_id"] == res["query_id"]).any()
    top = res[res["rank"] == 1].set_index("query_id")["neighbor_id"]
    for q in range(5):
        assert top[q] == q + 20


def test_knn_lsh_buckets_return_rows():
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((100, 8))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(100), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs]),
            }
        )
    )
    out = knn_lsh(ds, k=3, num_planes=4).to_pandas()
    assert len(out) > 0
    assert set(out.columns) == {"query_id", "neighbor_id", "rank", "sim"}


def test_embedding_near_dup_finds_twin():
    rng = np.random.default_rng(2)
    base = rng.standard_normal((10, 8))
    vecs = np.concatenate([base, base[:1] + 1e-6])  # vec 10 duplicates vec 0
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(11), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs]),
            }
        )
    )
    out = embedding_near_dup(ds, threshold=0.999)
    assert (0, 10) in set(zip(out["doc_a"], out["doc_b"]))


def test_token_count_and_lang_id():
    ds = _docs(["one two  three", "", "the of and to in a fox"])
    tc = token_count(ds).to_pandas().sort_values("doc_id")
    assert tc["n_tokens"].tolist() == [3, 0, 7]
    li = lang_id(ds).to_pandas().sort_values("doc_id")
    assert li["lang_pred"].tolist()[2] == "en"
    assert li["lang_pred"].tolist()[1] == "unk"


def test_scale_minmax_grouped():
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(["a", "a", "a", "b", "b"]),
                "v": pa.array([0.0, 5.0, 10.0, 2.0, 2.0]),
            }
        )
    )
    out = scale_column(ds, "v", scaler="minmax", group_col="k").to_pandas()
    a = out[out["k"] == "a"].sort_values("v")["scaled"].tolist()
    assert a == [0.0, 0.5, 1.0]
    b = out[out["k"] == "b"]["scaled"].tolist()
    assert b == [0.0, 0.0]  # degenerate range -> 0


def test_sessionize_and_window():
    ts = np.array(
        ["2024-01-01T00:00:00", "2024-01-01T00:10:00", "2024-01-01T02:00:00",
         "2024-01-01T00:05:00"],
        dtype="datetime64[us]",
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(range(4), pa.int64()),
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": pa.array(ts),
                "value": pa.array([1.0, 2.0, 3.0, 4.0]),
            }
        )
    )
    s = sessionize(ds, gap_seconds=1800).to_pandas().set_index("user_id")
    assert s.loc[1, "n_sessions"] == 2 and s.loc[2, "n_sessions"] == 1
    w = tumbling_window(ds, window_seconds=3600).to_pandas()
    assert w["n"].sum() == 4 and len(w) == 2


def test_sliding_window_membership():
    """Each event lands in exactly window/slide windows; every window an
    event belongs to covers its timestamp."""
    from graph_data_science_ray.stages.sessions import sliding_window

    ts = np.array(
        ["2024-01-01T00:00:00", "2024-01-01T00:10:00", "2024-01-01T02:00:00",
         "2024-01-01T00:59:59"],
        dtype="datetime64[us]",
    )
    ds = rd.from_arrow(
        pa.table({"ts": pa.array(ts), "value": pa.array([1.0, 2.0, 4.0, 8.0])})
    )
    w = (
        sliding_window(ds, window_seconds=3600, slide_seconds=900)
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    )
    assert w["n"].sum() == 4 * 4  # k = 4 windows per event
    assert w["value_sum"].sum() == 4 * 15.0
    # [23:15, 00:15) holds events at 00:00 and 00:10; [00:00, 01:00)
    # holds the three values 1, 2, 8
    def win(s):
        return int(np.datetime64(s, "us").astype(np.int64))
    lookup = dict(zip(w["window_start"], w["value_sum"]))
    assert lookup[win("2023-12-31T23:15:00")] == 3.0
    assert lookup[win("2024-01-01T00:00:00")] == 11.0
    assert lookup[win("2024-01-01T02:00:00")] == 4.0


def test_asof_join_semantics():
    """Backward as-of: latest right at-or-before each left ts per key;
    equal-ts right rows match (allow_exact), max-id wins ties; unmatched
    lefts keep NaN (outer) or drop (inner)."""
    from graph_data_science_ray.stages.sessions import asof_join

    def ev(rows):
        df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
        df["ts"] = pd.to_datetime(df["ts"])
        return rd.from_pandas(df)

    left = ev([
        (100, 1, "2026-01-01 10:00", 1.0),   # matches r2 (exact ts tie: max id)
        (101, 1, "2026-01-01 09:00", 2.0),   # before any right -> unmatched
        (102, 2, "2026-01-01 12:00", 3.0),   # matches r3 (latest <= ts)
        (103, 3, "2026-01-01 12:00", 4.0),   # key with no rights -> unmatched
    ])
    right = ev([
        (1, 1, "2026-01-01 10:00", 10.0),
        (2, 1, "2026-01-01 10:00", 20.0),    # same ts as r1: id 2 wins
        (3, 2, "2026-01-01 11:00", 30.0),
        (4, 2, "2026-01-01 13:00", 40.0),    # after left 102: ignored
    ])
    out = (
        asof_join(left, right).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [100, 101, 102, 103]
    got = out["r_event_id"].tolist()
    assert got[0] == 2.0 and got[2] == 3.0
    assert np.isnan(got[1]) and np.isnan(got[3])
    assert out["r_value"].tolist()[0] == 20.0
    inner = asof_join(left, right, inner=True).to_pandas()
    assert sorted(inner["event_id"]) == [100, 102]


def test_range_join_bands():
    """Interval membership is inclusive on both band edges; zero-match
    lefts survive with (0, 0.0); sums cover exactly the band."""
    from graph_data_science_ray.stages.sessions import range_join

    def ev(rows):
        df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
        df["ts"] = pd.to_datetime(df["ts"])
        return rd.from_pandas(df)

    left = ev([
        (100, 1, "2026-01-01 10:00:00", 1.0),
        (101, 2, "2026-01-01 10:00:00", 2.0),
    ])
    right = ev([
        (1, 1, "2026-01-01 09:00:00", 10.0),   # exactly -1h: included
        (2, 1, "2026-01-01 08:59:59", 20.0),   # just outside
        (3, 1, "2026-01-01 11:00:00", 40.0),   # exactly +1h: included
        (4, 1, "2026-01-01 10:30:00", 80.0),
    ])
    out = (
        range_join(left, right, before_seconds=3600, after_seconds=3600)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert out["n_in_range"].tolist() == [3, 0]
    assert out["sum_in_range"].tolist() == [130.0, 0.0]


def test_multimodal_stub_deterministic():
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(6), pa.int64()),
                "kind": pa.array(["image"] * 6),
                "payload": pa.array([bytes([i] * 50) for i in range(6)], pa.binary()),
            }
        )
    )
    a = extract_media_features(media, dim=4).to_pandas().sort_values("media_id")
    b = extract_media_features(media, dim=4).to_pandas().sort_values("media_id")
    for x, y in zip(a["feature"], b["feature"]):
        assert np.allclose(x, y)


def test_knn_ivf_recall():
    """IVF-Flat recall vs brute force: full-probe == exact; partial probe
    recalls most true neighbors on clustered data and is deterministic."""
    from graph_data_science_ray.stages.similarity import knn_brute_force, knn_ivf

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((4, 16)) * 3
    vecs = np.concatenate(
        [centers[i % 4] + rng.standard_normal(16) * 0.4 for i in range(160)]
    ).reshape(160, 16)
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(160, dtype=np.int64),
                      "embedding": list(vecs)})
    )
    qids = np.arange(8)
    exact = knn_brute_force(ds, query_ids=qids, k=5)
    full = knn_ivf(ds, query_ids=qids, k=5, num_lists=8, nprobe=8, seed=5)
    assert full[["query_id", "neighbor_id", "rank"]].equals(
        exact[["query_id", "neighbor_id", "rank"]]
    )
    approx = knn_ivf(ds, query_ids=qids, k=5, num_lists=8, nprobe=2, seed=5)
    hits = 0
    for q in qids:
        t = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(t & a)
    assert hits / (len(qids) * 5) >= 0.8
    again = knn_ivf(ds, query_ids=qids, k=5, num_lists=8, nprobe=2, seed=5)
    assert approx.equals(again)


def test_knn_descent_recall():
    from graph_data_science_ray.stages.knn_descent import knn_descent

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 16)) * 5
    vecs = np.concatenate([c + 0.1 * rng.standard_normal((20, 16)) for c in centers])
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs]),
            }
        )
    )
    approx = knn_descent(ds, k=5, max_rounds=5, seed=1)
    exact = knn_brute_force(ds, query_ids=np.arange(len(vecs)), k=5)
    hits = 0
    ap = approx.groupby("query_id")["neighbor_id"].apply(set)
    ex = exact.groupby("query_id")["neighbor_id"].apply(set)
    for q in ex.index:
        hits += len(ap.get(q, set()) & ex[q]) / len(ex[q])
    recall = hits / len(ex)
    assert recall > 0.8, f"recall {recall:.2f}"
    # determinism
    again = knn_descent(ds, k=5, max_rounds=5, seed=1)
    assert approx.equals(again)


def test_knn_descent_recall_unclustered():
    """Weakly-clustered corpora are the hard case for NN-Descent: at
    boost=1 the neighbor graph plateaus near 0.45 recall. The
    oversampled internal list (boost*k) + bidirectional local join must
    hold recall@k >= 0.9 on isotropic Gaussian vectors."""
    from graph_data_science_ray.stages.knn_descent import knn_descent

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((300, 64))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs]),
            }
        )
    )
    approx = knn_descent(ds, k=5, max_rounds=4, seed=1)
    exact = knn_brute_force(ds, query_ids=np.arange(len(vecs)), k=5)
    ap = approx.groupby("query_id")["neighbor_id"].apply(set)
    ex = exact.groupby("query_id")["neighbor_id"].apply(set)
    recall = np.mean([len(ap.get(q, set()) & ex[q]) / len(ex[q]) for q in ex.index])
    assert recall >= 0.9, f"recall {recall:.2f}"
    assert (approx.groupby("query_id")["rank"].max() <= 5).all()


def test_ngram_topk():
    from graph_data_science_ray.stages.text import ngram_topk

    ds = _docs(["a b c a b", "  b c  ", "a b", "x"])
    out = ngram_topk(ds, n=2, k=3).to_pandas()
    assert out["ngram"].tolist() == ["a b", "b c", "c a"]
    assert out["cnt"].tolist() == [3, 2, 1]
    # trigram variant; single-token docs contribute nothing
    out3 = ngram_topk(ds, n=3, k=10).to_pandas()
    assert out3["ngram"].tolist() == ["a b c", "b c a", "c a b"]
    assert out3["cnt"].tolist() == [1, 1, 1]  # tie broken by ngram asc


def test_multimodal_feature_to_ann_pipeline():
    """Composed multimodal flow: binary payloads -> actor-pool feature
    extraction -> exact cosine top-k over the extracted embeddings, all
    as one streaming Dataset chain (the schema/plumbing contract the
    real decoders plug into)."""
    from graph_data_science_ray.stages.multimodal import extract_media_features
    from graph_data_science_ray.stages.similarity import knn_brute_force

    payloads = [bytes([i % 7] * 60) for i in range(10)]
    payloads[7] = payloads[0]  # identical media => identical features
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(10), pa.int64()),
                "kind": pa.array(["image"] * 10),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    feats = extract_media_features(media, dim=8).map_batches(
        lambda df: pd.DataFrame(
            {"vec_id": df["media_id"], "embedding": df["feature"]}
        ),
        batch_format="pandas",
    )
    out = knn_brute_force(feats, np.array([0]), k=3)
    # the duplicate payload must surface as the top neighbor at sim ~1.0
    assert out.iloc[0]["neighbor_id"] == 7
    assert out.iloc[0]["sim"] > 0.999999


def test_netpbm_real_decode_resize_features():
    """netpbm (P5/P6) is REALLY decoded: resize picks actual pixels and
    features are actual statistics; non-netpbm keeps the stub, and
    strict mode raises only for non-netpbm payloads."""
    from graph_data_science_ray.stages.multimodal import (
        ImageResizer,
        MediaFeatureExtractor,
        decode_netpbm,
        encode_netpbm,
        netpbm_features,
    )

    # 4x4 RGB gradient: pixel (r,c) = (r*64, c*64, 128)
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    for r in range(4):
        for c in range(4):
            arr[r, c] = (r * 64, c * 64, 128)
    payload = encode_netpbm(arr)
    back = decode_netpbm(payload)
    assert back is not None and (back == arr).all()

    batch = pd.DataFrame(
        {"media_id": [0], "kind": ["image"], "payload": [payload]}
    )
    out = ImageResizer(2, 2)(batch)
    resized = decode_netpbm(out["payload"].iloc[0])
    # pixel-center nearest neighbor of a 4x4 at 2x2 samples rows/cols 1,3
    assert resized.shape == (2, 2, 3)
    assert (resized == arr[[1, 3]][:, [1, 3]]).all()
    assert out["width"].iloc[0] == 2 and out["height"].iloc[0] == 2

    feats = MediaFeatureExtractor(dim=14, strict=True)(batch)
    vec = np.asarray(feats["feature"].iloc[0], dtype=np.float32)
    expect = netpbm_features(arr, 14)
    assert np.allclose(vec, expect)
    # channel-0 mean is the real gradient mean (0+64+128+192)/4/255
    assert abs(vec[0] - (96.0 / 255.0)) < 1e-6

    # grayscale P5 round-trip
    g = np.arange(16, dtype=np.uint8).reshape(4, 4) * 15
    gp = encode_netpbm(g)
    assert (decode_netpbm(gp) == g).all()

    # non-netpbm: stub path works, strict raises
    junk = pd.DataFrame({"media_id": [1], "kind": ["image"], "payload": [b"JFIFxxxx"]})
    assert len(ImageResizer(2, 2)(junk)) == 1
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(dim=4, strict=True)(junk)


def test_frame_sampler_real_netpbm_sequence():
    """Concatenated-netpbm 'videos' get REAL frame extraction: each
    output tick carries an actual decoded-then-re-encoded frame."""
    from graph_data_science_ray.stages.multimodal import (
        FrameSampler,
        decode_netpbm,
        encode_netpbm,
    )

    frames = [np.full((2, 2, 3), v, dtype=np.uint8) for v in (10, 20, 30)]
    payload = b"".join(encode_netpbm(f) for f in frames)
    batch = pd.DataFrame(
        {"media_id": [5], "kind": ["video"], "payload": [payload],
         "duration_ms": [3000]}
    )
    out = FrameSampler(every_ms=1000, strict=True)(batch)
    assert out["frame_idx"].tolist() == [0, 1, 2]
    assert out["ts_ms"].tolist() == [0, 1000, 2000]
    got = [decode_netpbm(p)[0, 0, 0] for p in out["payload"]]
    assert got == [10, 20, 30]
    # non-netpbm payload: strict raises, default stubs
    junk = pd.DataFrame(
        {"media_id": [6], "kind": ["video"], "payload": [b"AVI junk"],
         "duration_ms": [2000]}
    )
    assert len(FrameSampler(every_ms=1000)(junk)) == 2
    with pytest.raises(NotImplementedError):
        FrameSampler(every_ms=1000, strict=True)(junk)


def test_wav_real_decode_and_features():
    """PCM16 WAV is REALLY decoded: round-trip exact, features are
    actual signal statistics; strict mode accepts WAV payloads."""
    from graph_data_science_ray.stages.multimodal import (
        MediaFeatureExtractor,
        decode_wav,
        encode_wav,
        wav_features,
    )

    t = np.arange(64)
    stereo = np.stack(
        [((t * 997) % 2001 - 1000), ((t * 31) % 401 - 200)], axis=1
    ).astype(np.int16)
    payload = encode_wav(stereo, rate=8000)
    back = decode_wav(payload)
    assert back is not None and back.shape == (64, 2) and (back == stereo).all()

    batch = pd.DataFrame(
        {"media_id": [0], "kind": ["audio"], "payload": [payload]}
    )
    feats = MediaFeatureExtractor(dim=10, strict=True)(batch)
    vec = np.asarray(feats["feature"].iloc[0], dtype=np.float32)
    assert np.allclose(vec, wav_features(stereo, 10))
    # channel-0 mean is the real sample mean
    assert abs(vec[0] - stereo[:, 0].mean() / 32768.0) < 1e-6
    assert decode_wav(b"RIFFxxxxJUNK") is None


def test_knn_lsh_multiband_amplifies_recall():
    """Multi-band LSH: recall vs brute force is at least the single-band
    recall (band collisions stack as 1-(1-p^b)^L) and clears a floor on
    clustered data; output schema/ranking matches the ANN contract."""
    from graph_data_science_ray.stages.similarity import (
        knn_brute_force,
        knn_lsh,
        knn_lsh_multiband,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((6, 16)) * 4
    vecs = np.concatenate(
        [centers[i % 6] + rng.standard_normal(16) * 0.5 for i in range(180)]
    ).reshape(180, 16)
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(180, dtype=np.int64),
                      "embedding": list(vecs)})
    )
    k = 5
    exact = knn_brute_force(ds, query_ids=np.arange(180), k=k)
    truth = set(zip(exact["query_id"].astype(int), exact["neighbor_id"].astype(int)))

    def recall(df):
        got = set(zip(df["query_id"].astype(int), df["neighbor_id"].astype(int)))
        return len(got & truth) / len(truth)

    single = recall(knn_lsh(ds, k=k, num_planes=8, seed=5).to_pandas())
    multi_df = knn_lsh_multiband(
        ds, k=k, num_planes=8, num_bands=4, seed=5
    ).to_pandas()
    multi = recall(multi_df)
    assert multi >= single - 1e-9
    assert multi >= 0.6, f"multiband recall {multi:.2f}"
    # per-query contract: <= k rows, ranks 1..n contiguous, sims sorted
    per = multi_df.groupby("query_id")
    assert int(per.size().max()) <= k
    for _, g in list(per)[:5]:
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        s = g["sim"].to_numpy()
        assert (s[1:] <= s[:-1] + 1e-9).all()


def test_decontaminate_planted(ray_session):
    import pandas as pd
    import ray.data as rd

    from graph_data_science_ray.stages.dedup import decontaminate

    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox jumps",   # shares 3-gram with bench
                "totally unrelated content here",
                "short one",                    # <3 tokens, whole-doc shingle
                "",                             # empty: zero shingles
            ],
        }
    )
    bench = pd.DataFrame(
        {"doc_id": [100, 101], "text": ["quick brown fox trots", "short one"]}
    )
    out = (
        decontaminate(rd.from_pandas(corpus), rd.from_pandas(bench))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2, 3, 4]
    assert list(out["contaminated"]) == [1, 0, 1, 0]
    assert out.loc[0, "hits"] == 1  # "quick brown fox"
    assert out.loc[2, "hits"] == 1  # whole-doc shingle exact match


def test_distribution_summary_order_stats(ray_session):
    import pandas as pd
    import ray.data as rd

    from graph_data_science_ray.stages.stats import distribution_summary

    vals = np.arange(100, dtype=np.int64)  # 0..99
    rng = np.random.RandomState(0)
    rng.shuffle(vals)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(7)
    out = distribution_summary(ds, "v")
    r = out.iloc[0]
    assert r["n"] == 100 and r["min_value"] == 0 and r["max_value"] == 99
    assert r["mean_ppm"] == 1_000_000 * 4950 // 100
    # ceil(q*n)-1 on 0..99: p50 -> idx 49, p75 -> 74, p90 -> 89, p999 -> 99
    assert r["p5"] == 49 and r["p75"] == 74 and r["p9"] == 89
    assert r["p95"] == 94 and r["p99"] == 98 and r["p999"] == 99


def test_chunk_documents_windows(ray_session):
    import pandas as pd
    import ray.data as rd

    from graph_data_science_ray.stages.text import chunk_documents

    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3],
         "text": [" ".join(str(i) for i in range(10)), "a b", ""]}
    )
    out = (
        chunk_documents(rd.from_pandas(docs), chunk_tokens=4, overlap=2)
        .to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    d1 = out[out["doc_id"] == 1]
    # stride 2 over 10 tokens -> starts 0,2,4,6,8
    assert list(d1["chunk_idx"]) == [0, 1, 2, 3, 4]
    assert d1.iloc[0]["chunk_text"] == "0 1 2 3"
    assert d1.iloc[1]["chunk_text"] == "2 3 4 5"
    assert d1.iloc[4]["chunk_text"] == "8 9" and d1.iloc[4]["n_tokens"] == 2
    assert list(out[out["doc_id"] == 2]["chunk_text"]) == ["a b"]
    assert (out["doc_id"] == 3).sum() == 0  # empty doc: no chunks


def test_scale_embedding_scalers(ray_session):
    import pandas as pd
    import ray.data as rd

    from graph_data_science_ray.stages.scale import scale_embedding

    rng = np.random.RandomState(1)
    vecs = [rng.randn(4) for _ in range(50)]
    ds = rd.from_pandas(pd.DataFrame({"vec_id": range(50), "embedding": vecs}))
    m = np.stack(vecs)

    mm = scale_embedding(ds, scaler="minmax").to_pandas().sort_values("vec_id")
    got = np.stack(mm["scaled"].to_list())
    want = (m - m.min(axis=0)) / (m.max(axis=0) - m.min(axis=0))
    assert np.allclose(got, want)
    assert got.min() >= 0 and got.max() <= 1

    ss = scale_embedding(ds, scaler="stdscore").to_pandas().sort_values("vec_id")
    got = np.stack(ss["scaled"].to_list())
    want = (m - m.mean(axis=0)) / m.std(axis=0)
    assert np.allclose(got, want)


def test_hll_registers_estimate_and_merge():
    """HLL estimate within sketch tolerance of the true distinct count;
    register tables are mergeable (elementwise max == whole-corpus
    table); duplicates don't move the sketch."""
    from graph_data_science_ray.pipelines.agg import hash_aggregate
    from graph_data_science_ray.stages.sketch import (
        approx_distinct,
        hll_estimate,
        hll_registers,
    )

    n = 3000
    texts = [f"value-{i}" for i in range(n)] + [f"value-{i}" for i in range(500)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t)
    est = approx_distinct(ds, "text")
    assert abs(est - n) / n < 0.2  # 256 registers -> ~6.5% typical error

    # mergeability: registers(half A) max registers(half B) == registers(all)
    whole = (
        hll_registers(ds, "text").to_pandas()
        .sort_values("register").reset_index(drop=True)
    )
    a = hll_registers(rd.from_arrow(t.slice(0, 1500)), "text")
    b = hll_registers(rd.from_arrow(t.slice(1500)), "text")
    merged = (
        hash_aggregate(a.union(b), ["register"], "rho", op="max", num_parts=4)
        .to_pandas().sort_values("register").reset_index(drop=True)
    )
    assert (merged["rho"].to_numpy() == whole["rho"].to_numpy()).all()
    assert hll_estimate(merged) == hll_estimate(whole)


def test_cms_overestimate_and_merge():
    """CMS estimates never undercount (min-over-rows >= true count);
    register tables merge by addition; heavy hitters catch every token
    above the share threshold (no false negatives by construction)."""
    from graph_data_science_ray.pipelines.agg import hash_aggregate
    from graph_data_science_ray.stages.sketch import (
        cms_heavy_hitters,
        cms_registers,
    )

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    # skewed: token w0 dominates
    words = rng.choice(vocab, p=[0.3] + [0.7 / 39] * 39, size=6000)
    texts = [" ".join(words[i:i + 20]) for i in range(0, 6000, 20)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t)

    whole = (
        cms_registers(ds, "text").to_pandas()
        .sort_values(["hrow", "col"]).reset_index(drop=True)
    )
    # every register row sums to the total token count
    assert (whole.groupby("hrow")["cnt"].sum() == 6000).all()

    # mergeability: registers(A) + registers(B) == registers(all)
    a = cms_registers(rd.from_arrow(t.slice(0, 150)), "text")
    b = cms_registers(rd.from_arrow(t.slice(150)), "text")
    merged = (
        hash_aggregate(a.union(b), ["hrow", "col"], "cnt", op="sum",
                       num_parts=4)
        .to_pandas().sort_values(["hrow", "col"]).reset_index(drop=True)
    )
    assert (merged["cnt"].to_numpy() == whole["cnt"].to_numpy()).all()

    # overestimate property + threshold recall
    hh = cms_heavy_hitters(ds, "text", min_share_ppm=50_000).to_pandas()
    true = pd.Series(words).value_counts()
    for tok, est in zip(hh["token"], hh["est"]):
        assert est >= true[tok]
    thresh = 6000 * 50_000 // 1_000_000
    for tok, cnt in true.items():
        if cnt >= thresh:
            assert tok in set(hh["token"])


def test_bloom_decontaminate_superset_of_exact():
    """Bloom decontamination never misses a true hit: its flag set is a
    superset of the exact shingle-join decontaminate flags, and every
    truly contaminated doc has bloom_hits >= its exact hits."""
    from graph_data_science_ray.stages.dedup import decontaminate
    from graph_data_science_ray.stages.sketch import bloom_decontaminate

    rng = np.random.default_rng(13)
    vocab = [f"t{i}" for i in range(60)]
    bench_texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(8)]
    corpus_texts = [" ".join(rng.choice(vocab, size=15)) for _ in range(40)]
    # plant exact 3-gram overlap into a third of the corpus
    for j in range(0, 40, 3):
        src = bench_texts[j % 8].split()
        corpus_texts[j] = " ".join(
            corpus_texts[j].split()[:5] + src[4:7] + ["zz"]
        )
    corpus = rd.from_arrow(pa.table(
        {"doc_id": pa.array(range(40), pa.int64()),
         "text": pa.array(corpus_texts, pa.string())}))
    bench = rd.from_arrow(pa.table(
        {"doc_id": pa.array(range(100, 108), pa.int64()),
         "text": pa.array(bench_texts, pa.string())}))

    exact = (decontaminate(corpus, bench).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    bloom = (bloom_decontaminate(corpus, bench).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert (bloom["doc_id"] == exact["doc_id"]).all()
    # no false negatives: bloom flags everywhere exact flags
    assert (bloom["contaminated"] >= exact["contaminated"]).all()
    assert (bloom["bloom_hits"] >= exact["hits"]).all()
    assert int(exact["contaminated"].sum()) >= 10  # planting worked


def test_bloom_decontaminate_empty_benchmark():
    """An empty benchmark flags nothing (schema-stable empty bit set)."""
    from graph_data_science_ray.stages.sketch import bloom_decontaminate

    empty = rd.from_arrow(pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "text": pa.array([], pa.string())}))
    docs = rd.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "text": pa.array(["a b c d", "x y z w"], pa.string())}))
    out = (bloom_decontaminate(docs, empty).to_pandas()
           .sort_values("doc_id"))
    assert out["contaminated"].tolist() == [0, 0]
    assert out["bloom_hits"].tolist() == [0, 0]


def test_image_ahash_contract():
    """aHash: identical images share the hash, a negated image flips
    it, resize path engages for non-8x8 inputs, hex is 16 chars."""
    from graph_data_science_ray.stages.multimodal import (
        _nn_resize,
        image_ahash,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    h1 = image_ahash(img)
    assert len(h1) == 16 and int(h1, 16) >= 0
    assert image_ahash(img) == h1  # deterministic
    # hash of the pre-resized image equals hash of the original
    assert image_ahash(_nn_resize(img, 8, 8)) == h1
    # gradient image: top half dark, bottom bright -> lower 32 bits set
    grad = np.zeros((8, 8), dtype=np.uint8)
    grad[4:, :] = 255
    hg = image_ahash(grad)
    assert int(hg, 16) == int("ffffffff00000000", 16)


def test_ahash_near_dup_planted_pair():
    """Planted exact duplicate is found at hamming 0; pairs are
    canonical (a<b), partition-invariant; banding is exact for
    max_hamming < num_bands (pigeonhole)."""
    import ray.data as rd

    from graph_data_science_ray.stages.multimodal import (
        ahash_near_dup,
        encode_netpbm,
    )

    r = np.arange(8)[:, None, None]
    c = np.arange(8)[None, :, None]

    def img(i):
        return np.concatenate(
            [(i * (1 + 3 * r + 5 * c)) % 256,
             (i * i + 7 * r + 11 * c) % 256,
             (i * (r + c + 1) + 13) % 256],
            axis=2,
        ).astype(np.uint8)

    rows = [(i, encode_netpbm(img(100 if i == 47 else i))) for i in range(60)]
    media = rd.from_pandas(pd.DataFrame(
        {"media_id": np.array([a for a, _ in rows], dtype=np.int64),
         "payload": [b for _, b in rows]}
    )).repartition(4)
    out = ahash_near_dup(media, max_hamming=3, num_bands=4)
    assert (out["id_a"] < out["id_b"]).all()
    # 47 carries image(100): no other id in [0,60) shares image(100)'s
    # exact hash unless formula-periodic; at minimum the pair set is
    # stable across partitioning
    again = ahash_near_dup(media.repartition(7), max_hamming=3, num_bands=4)
    assert out.equals(again)
    # exact recall vs brute force over engine hashes
    from graph_data_science_ray.stages.multimodal import (
        decode_netpbm,
        image_ahash,
    )

    hs = {i: int(image_ahash(decode_netpbm(p)), 16) for i, p in rows}
    ref = sorted(
        (a, b, bin(hs[a] ^ hs[b]).count("1"))
        for a in hs for b in hs
        if a < b and bin(hs[a] ^ hs[b]).count("1") <= 3
    )
    got = list(out.itertuples(index=False, name=None))
    assert got == ref


def test_audio_fingerprint_contract():
    """Deterministic frame-energy hash; silence hashes to zero bits;
    a loud tail flips exactly the tail frames."""
    from graph_data_science_ray.stages.multimodal import (
        audio_fingerprint,
        decode_wav,
        encode_wav,
    )

    silent = np.zeros(256, dtype=np.int16)
    assert audio_fingerprint(silent) == "0" * 16
    loud_tail = np.zeros(256, dtype=np.int16)
    loud_tail[192:] = 1000  # frames 48..63 carry all the energy
    h = int(audio_fingerprint(loud_tail), 16)
    assert h == sum(1 << b for b in range(48, 64))
    # decode round trip preserves the fingerprint
    rt = decode_wav(encode_wav(loud_tail, rate=8000))
    assert audio_fingerprint(rt) == audio_fingerprint(loud_tail)


def test_hll_grouped_matches_per_key_global():
    """Grouped HLL: each key's sparse register set equals the nonzero
    registers of a global HLL run on that key's rows alone; estimates
    track per-key distinct counts; repartitioning is a no-op."""
    from graph_data_science_ray.stages.sketch import (
        approx_distinct_by,
        hll_registers,
        hll_registers_by,
    )

    texts, keys = [], []
    for i in range(1200):
        texts.append(f"a-{i}")
        keys.append("a")
    for i in range(300):
        texts.append(f"b-{i % 50}")  # 50 distinct under key b
        keys.append("b")
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "source": pa.array(keys, pa.string())})
    ds = rd.from_arrow(t)
    grouped = (
        hll_registers_by(ds, "source", "text").to_pandas()
        .sort_values(["source", "register"]).reset_index(drop=True)
    )
    for key in ("a", "b"):
        rows = rd.from_arrow(t.filter(pa.compute.equal(t["source"], key)))
        solo = hll_registers(rows, "text").to_pandas()
        solo = solo[solo["rho"] > 0].sort_values("register")
        g = grouped[grouped["source"] == key]
        assert (g["register"].to_numpy() == solo["register"].to_numpy()).all()
        assert (g["rho"].to_numpy() == solo["rho"].to_numpy()).all()

    est = approx_distinct_by(ds, "source", "text").set_index("source")["estimate"]
    assert abs(est["a"] - 1200) / 1200 < 0.2
    assert abs(est["b"] - 50) / 50 < 0.35  # small-range correction regime

    g2 = (
        hll_registers_by(ds.repartition(7), "source", "text").to_pandas()
        .sort_values(["source", "register"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(grouped, g2)
