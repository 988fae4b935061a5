"""IR stages (tf-idf / BM25 / unigram NLL), quality filters, sampling
additions, semantic dedup and DAG longest path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graph_data_science_ray.stages.ir import (
    bm25_topk,
    doc_freq,
    doc_terms,
    tf_idf_topk,
    unigram_nll,
)
from graph_data_science_ray.stages.quality import (
    c4_quality,
    pii_scrub,
    token_repetition,
)
from graph_data_science_ray.stages.sampling import sample_global_k, stratified_sample


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )


def test_doc_terms_and_freq():
    ds = _docs(["a b a", "b c", "", "A a"])
    t = doc_terms(ds).to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert t[t["doc_id"] == 0].set_index("term")["tf"].to_dict() == {"a": 2, "b": 1}
    assert t[t["doc_id"] == 3].set_index("term")["tf"].to_dict() == {"a": 2}  # lowercased
    assert 2 not in set(t["doc_id"])  # empty doc emits nothing
    df = doc_freq(ds).to_pandas().set_index("term")["df"].to_dict()
    assert df == {"a": 2, "b": 2, "c": 1}


def test_tf_idf_strategies_agree():
    texts = [f"w{i % 7} w{i % 3} common common w{i % 11}" for i in range(60)]
    ds = _docs(texts)
    a = (
        tf_idf_topk(ds, k=2, strategy="broadcast")
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    b = (
        tf_idf_topk(ds, k=2, strategy="join")
        .to_pandas()[["doc_id", "term", "tf", "df"]]
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # "common" has df = N => idf 0: beaten whenever a doc has 2 rarer terms
    # (doc 5 = "w5 w2 common common w5" -> top-2 is {w5, w2})
    assert set(a[a["doc_id"] == 5]["term"]) == {"w5", "w2"}


def test_bm25_ranks_matching_docs():
    ds = _docs(["spark spark window", "spark", "nothing here", "window hash spark"])
    out = bm25_topk(ds, ["spark", "window", "hash"], n=10).to_pandas()
    assert 2 not in set(out["doc_id"])  # zero-score docs dropped
    # doc 3 matches all three query terms -> top rank
    assert out.iloc[0]["doc_id"] == 3
    assert (out["score_ppm"] > 0).all()


def test_unigram_nll_integer_exact_and_empty_docs():
    ds = _docs(["a a b", "b", ""])
    out = unigram_nll(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # corpus: a:2, b:2, T=4 -> lnC=floor(ln2*1e6)=693147, lnT=floor(ln4*1e6)=1386294
    lnc, lnt = 693147, 1386294
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "nll_ppm"] == 3 * lnt - 3 * lnc
    assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "nll_ppm"] == 0
    # parallelism-independent (integer sums)
    out2 = (
        unigram_nll(_docs(["a a b", "b", ""]).repartition(3))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_c4_quality_rules():
    long_ok = " ".join(["word"] * 60)
    ds = _docs([long_ok, long_ok + " {", "Lorem Ipsum " + long_ok, "short doc"])
    out = c4_quality(ds, min_words=50).to_pandas().sort_values("doc_id")
    assert out["keep"].tolist() == [1, 0, 0, 0]
    assert out["has_brace"].tolist() == [0, 1, 0, 0]
    assert out["has_lorem"].tolist() == [0, 0, 1, 0]
    # line accounting
    ds2 = _docs(['one line.\nno punct\nend?\n"quoted"'])
    o2 = c4_quality(ds2).to_pandas()
    assert o2.loc[0, "n_lines"] == 4
    assert o2.loc[0, "n_terminal_lines"] == 3


def test_token_repetition_signals():
    ds = _docs(["a b a b a b a b", "x y z w v u t s", ""])
    out = token_repetition(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc 0: 8 tokens, 2 distinct, 7 bigrams, top bigram "a b" x4 -> fails both rules
    assert out.loc[0].tolist() == [0, 8, 2, 7, 4, 0]
    # doc 1: all distinct, bigrams unique -> keep
    assert out.loc[1, "keep"] == 1
    # empty doc: keep (0 >= 0, 0 <= 0)
    assert out.loc[2, "keep"] == 1


def test_pii_scrub():
    ds = _docs(["mail me at a.b@test.org or c@d.io!", "no pii"])
    out = pii_scrub(ds, emit_text=True).to_pandas().sort_values("doc_id")
    assert out.loc[0, "n_emails"] == 2
    assert out.loc[0, "redacted_chars"] == len("a.b@test.org") + len("c@d.io")
    assert "[EMAIL]" in out.loc[0, "text"] and "a.b@test.org" not in out.loc[0, "text"]
    assert out.loc[1, "n_emails"] == 0


def _grouped(n=90):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)]),
            }
        )
    )


def test_stratified_sample_exact_counts_and_determinism():
    out = stratified_sample(_grouped(), "lang", 0.2).to_pandas()
    sizes = out.groupby("lang").size()
    assert (sizes == int(np.ceil(0.2 * 30))).all()
    out2 = (
        stratified_sample(_grouped().repartition(7), "lang", 0.2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True), out2
    )


def test_sample_global_k():
    out = sample_global_k(_grouped(), k=10).to_pandas()
    assert len(out) == 10
    out2 = (
        sample_global_k(_grouped().repartition(5), k=10)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True), out2
    )


def test_semantic_dedup_clusters_bound_pairs():
    from graph_data_science_ray.stages.similarity import semantic_dedup

    rng = np.random.default_rng(3)
    # two well-separated clusters around +e0 and -e0
    base = np.zeros((2, 8)); base[0, 0] = 10.0; base[1, 0] = -10.0
    vecs = np.concatenate(
        [base[i % 2] + 0.01 * rng.standard_normal(8) for i in range(40)]
    ).reshape(40, 8)
    emb = rd.from_arrow(
        pa.table(
            {"vec_id": pa.array(range(40), pa.int64()),
             "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))}
        )
    )
    out = semantic_dedup(emb, n_clusters=2, threshold=0.99).to_pandas()
    assert len(out)  # same-cluster near-dups found
    # no cross-parity pairs: ids of one parity always share a cluster
    assert ((out["doc_a"] % 2) == (out["doc_b"] % 2)).all()
    assert (out["doc_a"] < out["doc_b"]).all()


def test_dag_longest_path_chain(graph_from_edges, tmp_path):
    import graph_data_science_ray as gdsr
    import pyarrow as _pa

    from graph_data_science_ray.functions.coloring import dag_longest_path

    # chain 0->1->2->3 plus shortcut 0->2: longest layers 0,1,2,3
    gd, gu, idmap, enc, sym = graph_from_edges(
        [(0, 1), (1, 2), (2, 3), (0, 2)]
    )

    def neg(t):
        return _pa.table(
            {"src": t["src"], "dst": t["dst"],
             "weight": np.full(t.num_rows, -1.0, dtype=np.float64)}
        )

    g = gdsr.GraphStore.project(
        enc.map_batches(neg, batch_format="pyarrow"), str(tmp_path / "gdag"),
        idmap=idmap, num_partitions=2, directed=True,
    )
    out = dag_longest_path(g)
    from tests.conftest import keys_to_ids

    got = dict(zip(keys_to_ids(out["node"]), out["layer"]))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bigram_nll_closed_form():
    """Two-doc corpus with hand-computable bigram counts."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from graph_data_science_ray.stages.ir import bigram_nll

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["a b a b", "a b c", "x"],
    })).repartition(2)
    out = (bigram_nll(docs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # bigram counts: "a b": 3 (2 in d1, 1 in d2); "b a": 1; "b c": 1
    # prefix counts: a·: 3, b·: 2
    ln = lambda c: int(np.floor(np.log(float(c)) * 1e6))
    d1 = 2 * (ln(3) - ln(3)) + 1 * (ln(2) - ln(1))   # 2x "a b" + "b a"
    d2 = 1 * (ln(3) - ln(3)) + 1 * (ln(2) - ln(1))   # "a b" + "b c"
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_bigrams"].tolist() == [3, 2, 0]
    assert out["nll_ppm"].tolist() == [d1, d2, 0]
    # determinism across partitioning
    b = (bigram_nll(docs.repartition(5)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert out.equals(b)


def test_term_counts_topk_exact_and_partition_invariant():
    """Hand-computable corpus; top-k order (tf DESC, term ASC); ties
    break lexicographically; result invariant to partitioning."""
    import ray.data as rd

    from graph_data_science_ray.stages.ir import term_counts_topk

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "text": ["a b a", "B c a", "c d", None],
    })).repartition(3)
    out = term_counts_topk(docs, k=3, num_parts=4)
    # counts: a=3, b=2 (case-folded), c=2, d=1 -> top3 = a, b, c
    assert out["term"].tolist() == ["a", "b", "c"]
    assert out["tf"].tolist() == [3, 2, 2]
    again = term_counts_topk(docs.repartition(1), k=3, num_parts=7)
    assert out.equals(again)
    # k larger than vocab returns everything
    full = term_counts_topk(docs, k=100)
    assert full["tf"].sum() == 8 and len(full) == 4


def test_hashed_features_exact_and_fold():
    """Hand-checkable folding: same token always lands in one bucket;
    counts sum across repeats; partition-invariant."""
    import hashlib

    import ray.data as rd

    from graph_data_science_ray.stages.ir import hashed_features

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["a a b", "A c"],
    })).repartition(2)
    out = (hashed_features(docs, dim=8).to_pandas()
           .sort_values(["doc_id", "bucket"]).reset_index(drop=True))
    bk = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 8
    # doc1: a->2 at bk(a), b->1 at bk(b); doc2: a->1, c->1 (case-folded)
    exp = pd.DataFrame({
        "doc_id": [1, 1, 2, 2],
        "bucket": [bk("a"), bk("b"), bk("a"), bk("c")],
        "cnt": [2, 1, 1, 1],
    }).sort_values(["doc_id", "bucket"]).reset_index(drop=True)
    assert out.astype(np.int64).equals(exp.astype(np.int64))
    again = (hashed_features(docs.repartition(1), dim=8, num_parts=3)
             .to_pandas().sort_values(["doc_id", "bucket"])
             .reset_index(drop=True))
    assert out.equals(again)


def test_token_entropy_integer_exact():
    from graph_data_science_ray.stages.ir import token_entropy

    ds = _docs(["a a b", "x x x x", "", "p q r"])
    out = token_entropy(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc 0: n=3, counts {a:2, b:1} -> (3*floor(ln3*1e6) - 2*floor(ln2*1e6)) // 3
    ln2, ln3 = 693147, 1098612
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "ent_ppm"] == (3 * ln3 - 2 * ln2) // 3
    # uniform repetition -> zero entropy; empty doc -> zeros
    assert out.loc[1, "ent_ppm"] == 0
    assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "ent_ppm"] == 0
    # all-distinct -> maximal ln(n) entropy
    assert out.loc[3, "ent_ppm"] == ln3
    # row-local: repartitioning cannot change anything
    out2 = (
        token_entropy(_docs(["a a b", "x x x x", "", "p q r"]).repartition(4))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
