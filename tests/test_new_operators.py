"""Round-2 operators: node2vec, yens, A*, DFS, delta-stepping, SLLPA,
CELF, HashGNN, max-k-cut, k-spanning, Steiner, CNARW, L1/L2 scalers,
termination flag, weighted-node label propagation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

import graph_data_science_ray as gdsr
from tests.conftest import keys_to_ids


def _two_clusters():
    """Two 5-cliques joined by one bridge edge (nodes 0-4 and 5-9)."""
    edges = []
    for grp in (range(0, 5), range(5, 10)):
        grp = list(grp)
        for i in grp:
            for j in grp:
                if i < j:
                    edges.append((i, j))
    edges.append((4, 5))
    return edges


def test_node2vec_neighbors_closer_than_random(graph_from_edges):
    from graph_data_science_ray.functions.node2vec import node2vec

    _, gu, idmap, _, _ = graph_from_edges(_two_clusters())
    out = node2vec(gu, dim=16, walk_length=10, walks_per_node=6, epochs=3, seed=3)
    ids = keys_to_ids(out["node"])
    emb = np.stack(out["embedding"].to_numpy())[np.argsort(ids)]
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    same = np.mean([emb[i] @ emb[j] for i in range(5) for j in range(5) if i != j])
    cross = np.mean([emb[i] @ emb[j] for i in range(5) for j in range(5, 10)])
    assert same > cross
    # determinism
    again = node2vec(gu, dim=16, walk_length=10, walks_per_node=6, epochs=3, seed=3)
    assert np.allclose(np.stack(out["embedding"]), np.stack(again["embedding"]))


def test_yens_k_shortest(graph_from_edges):
    from graph_data_science_ray.functions.paths import yens_k_shortest

    # diamond with a longer detour: 0->1->3 (2), 0->2->3 (2), 0->4->5->3 (3)
    edges = [(0, 1), (1, 3), (0, 2), (2, 3), (0, 4), (4, 5), (5, 3)]
    _, _, idmap, enc, _ = graph_from_edges(edges)
    to_id = lambda k: int(idmap.to_ids(np.array([f"role:n{k:04d}"], dtype="U"))[0])
    out = yens_k_shortest(enc, len(idmap), to_id(0), to_id(3), k=3, weighted=False)
    costs = out.groupby("path_rank")["total_cost"].first().tolist()
    assert costs == [2.0, 2.0, 3.0]
    # third path routes through nodes 4 and 5
    p3 = out[out["path_rank"] == 3]["node"].tolist()
    assert len(p3) == 4


def test_astar_matches_shortest_route(graph_from_edges):
    from graph_data_science_ray.functions.paths import astar_route
    from graph_data_science_ray.functions.sssp import shortest_path_route

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 4)]
    gd, _, idmap, _, _ = graph_from_edges(edges)
    to_id = lambda k: int(idmap.to_ids(np.array([f"role:n{k:04d}"], dtype="U"))[0])
    s, t = to_id(0), to_id(4)
    base = shortest_path_route(gd, s, t, weighted=False)
    h = np.zeros(gd.node_count)  # admissible trivially
    out = astar_route(gd, s, t, heuristic=h, weighted=False)
    assert out["node"].tolist() == base["node"].tolist()
    assert np.allclose(out["distance"], base["distance"])


def test_dfs_preorder_line(graph_from_edges):
    from graph_data_science_ray.functions.paths import dfs_preorder

    gd, _, idmap, _, _ = graph_from_edges([(0, 1), (0, 2), (1, 3)])
    to_id = lambda k: int(idmap.to_ids(np.array([f"role:n{k:04d}"], dtype="U"))[0])
    out = dfs_preorder(gd, to_id(0))
    assert keys_to_ids(out["node"]).tolist() == [0, 1, 3, 2]


def test_delta_stepping_equals_bellman_ford(graph_from_edges):
    from graph_data_science_ray.functions.paths import delta_stepping
    from graph_data_science_ray.functions.sssp import shortest_paths

    edges = [(0, 1), (0, 1), (1, 2), (2, 3), (0, 3), (3, 4), (1, 4), (1, 4), (1, 4)]
    gd, _, idmap, _, _ = graph_from_edges(edges)
    to_id = lambda k: int(idmap.to_ids(np.array([f"role:n{k:04d}"], dtype="U"))[0])
    a = shortest_paths(gd, source_id=to_id(0), weighted=True).sort_values("node")
    b = delta_stepping(gd, source_id=to_id(0), delta=1.5, weighted=True).sort_values("node")
    assert a["node"].tolist() == b["node"].tolist()
    assert np.allclose(a["distance"].to_numpy(), b["distance"].to_numpy())


def test_sllpa_overlapping_communities(graph_from_edges):
    from graph_data_science_ray.functions.community2 import sllpa

    _, gu, idmap, _, _ = graph_from_edges(_two_clusters())
    out = sllpa(gu, rounds=20, threshold=0.15, seed=5)
    ids = keys_to_ids(out["node"])
    comms = keys_to_ids(out["community"])
    # every node belongs to at least one community; the bridge endpoints
    # may belong to more than one (overlap is permitted, not required)
    assert set(ids) == set(range(10))
    df = pd.DataFrame({"n": ids, "c": comms})
    # nodes within a clique mostly share a dominant community
    left = df[df["n"] < 5]["c"].value_counts().index[0]
    right = df[df["n"] >= 5]["c"].value_counts().index[0]
    assert left != right or len(df) > 10  # distinct, or overlap happened


def test_celf_star_center_first(graph_from_edges):
    from graph_data_science_ray.functions.influence import celf

    star = [(0, i) for i in range(1, 9)]
    gd, _, idmap, _, _ = graph_from_edges(star)
    out = celf(gd, k=2, propagation_probability=0.5,
               monte_carlo_simulations=20, seed=2)
    assert keys_to_ids(out["node"])[0] == 0
    assert out["spread_gain"].iloc[0] > out["spread_gain"].iloc[1]


def test_hashgnn_neighborhood_similarity(graph_from_edges):
    from graph_data_science_ray.functions.hashgnn import hash_gnn

    _, gu, idmap, _, _ = graph_from_edges(_two_clusters())
    out = hash_gnn(gu, dim=32, iterations=1, seed=4)
    ids = keys_to_ids(out["node"])
    sig = np.stack(out["signature"].to_numpy())[np.argsort(ids)]
    same = np.mean([(sig[0] == sig[j]).mean() for j in range(1, 5)])
    cross = np.mean([(sig[0] == sig[j]).mean() for j in range(6, 10)])
    assert same > cross
    again = hash_gnn(gu, dim=32, iterations=1, seed=4)
    assert np.array_equal(np.stack(out["signature"]), np.stack(again["signature"]))


def test_max_k_cut_bipartite(graph_from_edges):
    from graph_data_science_ray.functions.community2 import approx_max_k_cut

    # complete bipartite K3,3: optimal 2-cut = all 9 edges
    edges = [(i, j) for i in range(3) for j in range(3, 6)]
    _, _, idmap, _, sym = graph_from_edges(edges)
    assign, cut = approx_max_k_cut(sym, len(idmap), k=2, rounds=10, seed=1, idmap=idmap)
    assert cut == 9.0
    ids = keys_to_ids(assign["node"])
    part = assign["part"].to_numpy()[np.argsort(ids)]
    assert len(set(part[:3])) == 1 and len(set(part[3:])) == 1
    assert part[0] != part[3]


def test_k_spanning_tree_split(graph_from_edges):
    from graph_data_science_ray.functions.spanning import k_spanning_tree

    # line 0-1-2-3 with a heavy middle edge (weight 3 via repetition)
    edges = [(0, 1), (1, 2), (1, 2), (1, 2), (2, 3)]
    _, _, idmap, _, sym = graph_from_edges(edges)
    out = k_spanning_tree(sym, len(idmap), k=2)
    ids = np.argsort(keys_to_ids(out["node"].astype(str))) if out["node"].dtype == object else None
    df = pd.DataFrame({"n": keys_to_ids(out["node"]) if out["node"].dtype == object else out["node"],
                       "c": out["cluster"]})
    df = df.sort_values("n")
    c = df["c"].to_numpy()
    # heaviest edge (1,2) removed -> {0,1} and {2,3}
    assert c[0] == c[1] and c[2] == c[3] and c[0] != c[2]


def test_steiner_tree_line(graph_from_edges):
    from graph_data_science_ray.functions.spanning import steiner_tree

    _, gu, idmap, _, _ = graph_from_edges([(0, 1), (1, 2), (2, 3), (3, 4)])
    to_id = lambda k: int(idmap.to_ids(np.array([f"role:n{k:04d}"], dtype="U"))[0])
    tree, total = steiner_tree(gu, to_id(0), [to_id(2), to_id(4)], weighted=False)
    assert total == 4.0  # the whole line
    assert len(tree) == 4


def test_cnarw_sample(graph_from_edges):
    from graph_data_science_ray.functions.walks import cnarw_sample

    _, gu, idmap, _, _ = graph_from_edges(_two_clusters())
    out = cnarw_sample(gu, sample_size=6, seed=3)
    assert 1 <= len(out) <= 6
    again = cnarw_sample(gu, sample_size=6, seed=3)
    assert out["node_id"].tolist() == again["node_id"].tolist()


def test_l1_l2_scalers():
    from graph_data_science_ray.stages.scale import scale_column

    ds = rd.from_arrow(pa.table({"v": pa.array([3.0, -4.0, 0.0])}))
    l1 = scale_column(ds, "v", scaler="l1norm").to_pandas().sort_values("v")
    assert np.allclose(sorted(l1["scaled"]), sorted([3 / 7, -4 / 7, 0.0]), atol=1e-6)
    l2 = scale_column(ds, "v", scaler="l2norm").to_pandas()
    assert np.allclose(sorted(l2["scaled"]), sorted([0.6, -0.8, 0.0]), atol=1e-6)


def test_termination_flag(graph_from_edges, tmp_path):
    from graph_data_science_ray.functions.pagerank import PageRankComputation
    from graph_data_science_ray.state.pregel import Pregel, TerminationFlag

    gd, _, _, _, _ = graph_from_edges([(0, 1), (1, 2), (2, 0)])
    flag = TerminationFlag(str(tmp_path / "stop"))
    flag.stop()
    engine = Pregel(gd, PageRankComputation(), termination_flag=flag)
    refs = engine.run(max_iterations=25)
    # stopped before any superstep ran: history is empty, states are init
    assert engine.history == []
    scores = engine.gather(refs, "rank")
    assert np.allclose(scores, 0.15)


def test_labelprop_node_weights(graph_from_edges):
    # node 2 votes with huge node weight: nodes 0,1 adopt its label
    gd, gu, idmap, _, _ = graph_from_edges([(0, 1), (1, 2), (0, 2)])
    nw = np.ones(len(idmap))
    nw[keys_to_ids(pd.Series(idmap.keys)) == 2] = 100.0
    out = gdsr.label_propagation(gu, max_iterations=6, node_weights=nw)
    labels = keys_to_ids(out["label"])
    assert (labels == 2).sum() >= 2


def test_node_similarity_cosine_and_filtered(graph_from_edges):
    from graph_data_science_ray.functions.nodesim import node_similarity

    # square 0-1-2-3-0: 0 and 2 share neighbors {1,3} with unit weights
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    cos = node_similarity(sym, len(idmap), metric="cosine")
    jac = node_similarity(sym, len(idmap), metric="jaccard")
    # unit weights: cosine == jaccard == 1.0 for the (0,2) and (1,3) pairs
    assert set(cos["sim_ppm"]) == {1_000_000}
    assert len(cos) == len(jac) == 2
    # filtered: only pairs touching node 0
    filt = node_similarity(sym, len(idmap), metric="jaccard", source_nodes=[0])
    assert len(filt) == 1


def test_graphstore_mutate_properties(graph_from_edges):
    gd, _, idmap, _, _ = graph_from_edges([(0, 1), (1, 2)])
    scores = gdsr.pagerank(gd, max_iterations=10)["score"].to_numpy()
    gd.add_node_property("pagerank", scores)
    assert gd.node_property_names() == ["pagerank"]
    assert np.allclose(gd.node_property("pagerank"), scores)
    # survives reload (persisted projection carries the mutation)
    g2 = gdsr.GraphStore.load(gd.path)
    assert np.allclose(g2.node_property("pagerank"), scores)
    streamed = g2.stream_node_property("pagerank")
    assert set(streamed.columns) == {"node", "pagerank"}
    g2.drop_node_property("pagerank")
    assert g2.node_property_names() == []


def test_subgraph_filter_expressions(graph_from_edges):
    from graph_data_science_ray.pipelines.transforms import subgraph_filter

    edges = [(0, 1), (0, 1), (0, 1), (1, 2), (2, 3)]
    _, _, idmap, enc, _ = graph_from_edges(edges)
    # edge expression: weight >= 3 keeps only the tripled edge
    sub, _ = subgraph_filter(enc, idmap, edge_expr="weight >= 3")
    assert sub.count() == 1
    # node expression over actor keys
    sub2, im2 = subgraph_filter(enc, idmap, node_expr="key != 'role:n0003'")
    assert len(im2) == len(idmap) - 1
    # aggregated table had 3 rows ((0,1) w=3, (1,2), (2,3)); dropping n3
    # removes (2,3)
    assert sub2.count() == 2


def test_biased_walks_return_parameter(graph_from_edges):
    """p controls backtracking: huge p suppresses immediate returns,
    tiny p encourages them (node2vec second-order semantics)."""
    from graph_data_science_ray.functions.walks import biased_random_walks

    _, gu, idmap, _, _ = graph_from_edges([(0, 1), (1, 2), (2, 3), (3, 4)])

    def return_rate(p):
        w = biased_random_walks(gu, walk_length=12, walks_per_node=8, p=p, q=1.0, seed=9)
        w = w.copy()
        w["nid"] = keys_to_ids(w["node"])
        rate_n = 0
        rate_d = 0
        for _, g in w.groupby("walk_id"):
            seq = g.sort_values("step")["nid"].to_numpy()
            for i in range(2, len(seq)):
                rate_d += 1
                if seq[i] == seq[i - 2]:
                    rate_n += 1
        return rate_n / max(rate_d, 1)

    assert return_rate(0.01) > return_rate(100.0) + 0.2
    # determinism
    a = biased_random_walks(gu, walk_length=8, walks_per_node=2, p=2.0, q=0.5, seed=4)
    b = biased_random_walks(gu, walk_length=8, walks_per_node=2, p=2.0, q=0.5, seed=4)
    assert a.equals(b)


def test_multimodal_resize_and_frame_sample():
    import pyarrow as pa

    from graph_data_science_ray.stages.multimodal import (
        resize_images,
        sample_frames,
    )

    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([1, 2], pa.int64()),
                "kind": pa.array(["image", "video"], pa.string()),
                "payload": pa.array([b"img-bytes", b"vid-bytes"], pa.binary()),
                "mime": pa.array(["image/png", "video/mp4"], pa.string()),
                "width": pa.array([640, 1280], pa.int32()),
                "height": pa.array([480, 720], pa.int32()),
                "duration_ms": pa.array([0, 3500], pa.int32()),
            }
        )
    )
    resized = resize_images(media, 64, 64).to_pandas().sort_values("media_id")
    assert (resized["width"] == 64).all() and (resized["height"] == 64).all()
    again = resize_images(media, 64, 64).to_pandas().sort_values("media_id")
    assert list(resized["payload"]) == list(again["payload"])  # deterministic
    frames = sample_frames(media, every_ms=1000).to_pandas()
    assert len(frames) == 3  # 3500ms // 1000
    assert frames["frame_idx"].tolist() == [0, 1, 2]


def test_bpe_token_count_and_winnowing():
    from graph_data_science_ray.stages.text import bpe_token_count, winnow_fingerprints

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    ["Hello, world! 42", "", "the quick brown fox jumps over it"],
                    pa.string(),
                ),
            }
        )
    )
    tc = bpe_token_count(docs).to_pandas().sort_values("doc_id")
    # Hello | , | world | ! | 4 | 2  -> 6
    assert tc["n_bpe_tokens"].tolist() == [6, 0, 7]
    fps = winnow_fingerprints(docs, k=4, window=4).to_pandas()
    assert set(fps["doc_id"]) == {0, 2}
    # shared substrings -> shared fingerprints: duplicate text matches
    dup = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(
                    ["the quick brown fox jumps", "xx the quick brown fox jumps yy"],
                    pa.string(),
                ),
            }
        )
    )
    f2 = winnow_fingerprints(dup, k=4, window=4).to_pandas()
    a = set(f2[f2["doc_id"] == 0]["fp"])
    b = set(f2[f2["doc_id"] == 1]["fp"])
    assert len(a & b) / len(a) > 0.5


def test_triangle_strategies_agree(graph_from_edges):
    from graph_data_science_ray.functions.triangles import triangle_count

    _, _, idmap, _, sym = graph_from_edges(_two_clusters())
    a, ta = triangle_count(sym, idmap=idmap, strategy="broadcast")
    b, tb = triangle_count(sym, idmap=idmap, strategy="shuffle")
    assert ta == tb
    assert a.sort_values("node")["triangles"].tolist() == b.sort_values("node")["triangles"].tolist()


def test_dedup_exact_filter_returns_table():
    from graph_data_science_ray.stages.dedup import dedup_exact_filter

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["same", "same", "other", "same"], pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
            }
        )
    )
    out = dedup_exact_filter(docs).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 2]
    assert set(out.columns) == {"doc_id", "text", "lang"}


def test_duplicate_spans_cross_doc_windows():
    """4-token windows: docs 0 and 1 share the span "a b c d"; doc 2 is
    short (<4 tokens, zero spans); doc 3 has spans but none duplicated.
    A span repeated WITHIN one doc only must not flag it."""
    from graph_data_science_ray.stages.dedup import duplicate_spans

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "a b c d e",          # spans: "a b c d", "b c d e"
                        "x a b c d",          # spans: "x a b c", "a b c d"
                        "too short",           # no spans
                        "p q r s t",          # unique spans
                        "u v w u v w u v w",  # "u v w u" etc. repeat within
                    ],
                    pa.string(),
                ),
            }
        )
    )
    out = (
        duplicate_spans(docs, window=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 4]
    assert out["n_spans"].tolist() == [2, 2, 0, 2, 3]
    assert out["dup_spans"].tolist() == [1, 1, 0, 0, 0]
    assert out["dup_flag"].tolist() == [1, 1, 0, 0, 0]


def test_dedup_clusters_transitive_chain():
    """A~B and B~C above threshold but A~C below: near-dup is not
    transitive pairwise, yet all three must land in ONE cluster with the
    min doc_id as keeper. Unrelated docs stay singleton keepers."""
    from graph_data_science_ray.stages.dedup import dedup_clusters

    a = " ".join(f"t{i}" for i in range(10))           # t0..t9
    b = " ".join(f"t{i}" for i in range(3, 13))        # t3..t12 (shares 5 shingles with a)
    c = " ".join(f"t{i}" for i in range(6, 16))        # t6..t15 (shares with b, barely with a)
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([7, 3, 9, 20], pa.int64()),
                "text": pa.array([a, b, c, "completely different words here"],
                                  pa.string()),
            }
        )
    )
    out = (
        dedup_clusters(docs, threshold=0.4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [3, 7, 9, 20]
    # chain collapses to min id 3
    assert out["cluster"].tolist() == [3, 3, 3, 20]
    assert out["is_keeper"].tolist() == [1, 0, 0, 1]


def test_boruvka_equal_weight_tie_no_cycle(graph_from_edges):
    """Equal-weight cross edges between three 2-node components form a
    3-cycle of picks; the union-find pick filter must keep the forest
    acyclic (V-1 edges for a connected graph)."""
    from graph_data_science_ray.functions.spanning import minimum_spanning_forest

    # pair edges weight 1, cross edges weight 2 (duplicated): round 1
    # merges the pairs, round 2's three equal-weight picks form the cycle
    edges = [(0, 3), (1, 4), (2, 5),
             (3, 1), (3, 1), (4, 2), (4, 2), (5, 0), (5, 0)]
    _, _, idmap, _, sym = graph_from_edges(edges)
    tree, total = minimum_spanning_forest(sym, len(idmap))
    assert len(tree) == 5  # 6 nodes, connected -> exactly V-1 edges
    assert total == 3 * 1 + 2 * 2


def test_louvain_block_layout_invariance(graph_from_edges):
    """Louvain moves must not depend on Ray block boundaries: per-batch
    partial (node, comm) rows are re-aggregated before the gain argmax."""
    from graph_data_science_ray.functions.louvain import louvain

    _, _, idmap, _, sym = graph_from_edges(_two_clusters())
    a = louvain(sym.repartition(1).materialize(), len(idmap))
    b = louvain(sym.repartition(16).materialize(), len(idmap))
    pd.testing.assert_frame_equal(a, b)
    # and the expected structure: the two cliques are separate communities
    c = a.sort_values("node")["community"].to_numpy()
    assert len(set(c[:5])) == 1 and len(set(c[5:])) == 1 and c[0] != c[5]


def test_max_k_cut_block_layout_invariance(graph_from_edges):
    from graph_data_science_ray.functions.community2 import approx_max_k_cut

    edges = [(i, j) for i in range(3) for j in range(3, 6)] + [(0, 1), (3, 4)]
    _, _, idmap, _, sym = graph_from_edges(edges)
    a1, cut1 = approx_max_k_cut(sym.repartition(1).materialize(), len(idmap), k=2, seed=3)
    a2, cut2 = approx_max_k_cut(sym.repartition(16).materialize(), len(idmap), k=2, seed=3)
    pd.testing.assert_frame_equal(a1, a2)
    assert cut1 == cut2


def test_node_similarity_topk_topn(graph_from_edges):
    """top_k bounds results per node (directed, sim desc / min-id ties);
    top_n bounds globally — both match a pandas reference on the full
    pair table."""
    from graph_data_science_ray.functions.nodesim import node_similarity

    _, _, idmap, _, sym = graph_from_edges(_two_clusters())
    n = len(idmap)
    full = node_similarity(sym, n)  # unordered pairs node_a < node_b
    directed = pd.concat(
        [full, full.rename(columns={"node_a": "node_b", "node_b": "node_a"})],
        ignore_index=True,
    )
    k = 2
    exp = (
        directed.sort_values(["node_a", "sim_ppm", "node_b"],
                             ascending=[True, False, True], kind="mergesort")
        .groupby("node_a", sort=False).head(k)
        .sort_values(["node_a", "node_b"]).reset_index(drop=True)
    )
    got = node_similarity(sym, n, top_k=k)
    pd.testing.assert_frame_equal(
        got[["node_a", "node_b", "sim_ppm"]].reset_index(drop=True),
        exp[["node_a", "node_b", "sim_ppm"]],
    )
    # global top-N over the top-K table
    got_n = node_similarity(sym, n, top_k=k, top_n=5)
    exp_n = (
        exp.sort_values(["sim_ppm", "node_a", "node_b"],
                        ascending=[False, True, True], kind="mergesort")
        .head(5).sort_values(["node_a", "node_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got_n[["node_a", "node_b", "sim_ppm"]].reset_index(drop=True),
        exp_n[["node_a", "node_b", "sim_ppm"]],
    )


def test_minhash_empty_docs_not_near_dups():
    """Empty/whitespace docs share all-zero signatures and always bucket
    together; the verify step must NOT emit them as pairs."""
    from graph_data_science_ray.stages.dedup import dedup_minhash_lsh

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["", "   ", "\n", "the quick brown fox jumps over the lazy dog today",
                 "the quick brown fox jumps over the lazy dog today!", "zz"],
    }))
    pairs = dedup_minhash_lsh(docs, threshold=0.3).to_pandas()
    empties = {0, 1, 2, 5}
    for _, r in pairs.iterrows():
        assert not (int(r["doc_a"]) in empties and int(r["doc_b"]) in empties)


def test_derive_edges_aggregation_modes():
    """Reference Aggregation modes (SINGLE/SUM/MIN/MAX/COUNT) over the
    inter-turn gap property; count must equal the default derivation."""
    import ray.data as rd

    from graph_data_science_ray.pipelines.edges import derive_edges_agg

    t = gdsr.transcripts_from_edge_list([(0, 1), (0, 1), (1, 2)])
    turns = gdsr.derive_turns(rd.from_arrow(t), keep_ts=True)
    base = gdsr.derive_edges(gdsr.derive_turns(rd.from_arrow(t))).to_pandas()
    cnt = derive_edges_agg(turns, "count").to_pandas()
    merged = base.merge(cnt, on=["src", "dst"], suffixes=("_b", "_c"))
    assert (merged["weight_b"] == merged["weight_c"]).all() and len(merged) == len(base)
    mn = derive_edges_agg(turns, "min").to_pandas().set_index(["src", "dst"])["weight"]
    mx = derive_edges_agg(turns, "max").to_pandas().set_index(["src", "dst"])["weight"]
    sm = derive_edges_agg(turns, "sum").to_pandas().set_index(["src", "dst"])["weight"]
    sg = derive_edges_agg(turns, "single").to_pandas().set_index(["src", "dst"])["weight"]
    assert (mn <= mx).all() and (sm >= mx).all()
    assert (sg == mn).all()  # documented deterministic SINGLE = MIN
    # the duplicated (0,1) conversation contributes two parallel gaps
    key = mn.index[mn.index.get_level_values(0).str.endswith("0000")][0]
    assert sm[key] == mn[key] + mx[key]


def test_symmetrize_aggregation_modes(graph_from_edges):
    import pandas as pd

    _, _, idmap, enc, _ = graph_from_edges([(0, 1), (1, 0), (1, 0), (1, 2)])
    s_sum = gdsr.symmetrize(enc, num_partitions=2).to_pandas()
    s_max = gdsr.symmetrize(enc, num_partitions=2, aggregation="max").to_pandas()
    s_min = gdsr.symmetrize(enc, num_partitions=2, aggregation="min").to_pandas()
    key = ["src", "dst"]
    m = (
        s_sum.set_index(key)["weight"].rename("s")
        .to_frame()
        .join(s_max.set_index(key)["weight"].rename("mx"))
        .join(s_min.set_index(key)["weight"].rename("mn"))
    )
    # (0,1): w_fwd=1, w_rev=2 -> sum 3, max 2, min 1; (1,2): single dir -> all 1
    assert (m["mn"] <= m["mx"]).all() and (m["s"] >= m["mx"]).all()
    pair = m[m["s"] == 3.0]
    assert len(pair) == 2 and (pair["mx"] == 2.0).all() and (pair["mn"] == 1.0).all()


def test_bellman_ford_negative_cycle(tmp_path):
    """Negative-cycle detection: nodes on or downstream of a reachable
    negative cycle are flagged; clean branches keep exact distances."""
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.functions.sssp import bellman_ford

    # 0 -> 1 -> 2 -> 1 (cycle 1-2 total weight -1), plus clean 0 -> 3 -> 4
    src = [0, 1, 2, 0, 3]
    dst = [1, 2, 1, 3, 4]
    w = [1.0, 1.0, -2.0, 5.0, 1.0]
    enc = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "weight": pa.array(w, pa.float64())})
    )
    g = gdsr.GraphStore.project(
        enc, str(tmp_path / "neg"), node_count=5, num_partitions=2, directed=True
    )
    out = bellman_ford(g, source_id=0).set_index("node")
    assert out.loc[1, "negative_cycle"] == 1
    assert out.loc[2, "negative_cycle"] == 1
    assert out.loc[0, "negative_cycle"] == 0
    assert out.loc[3, "negative_cycle"] == 0 and out.loc[3, "distance"] == 5.0
    assert out.loc[4, "negative_cycle"] == 0 and out.loc[4, "distance"] == 6.0

    # no negative cycle -> all flags zero, plain shortest paths
    enc2 = rd.from_arrow(
        pa.table({"src": pa.array([0, 1], pa.int64()),
                  "dst": pa.array([1, 2], pa.int64()),
                  "weight": pa.array([-1.0, 2.0], pa.float64())})
    )
    g2 = gdsr.GraphStore.project(
        enc2, str(tmp_path / "neg2"), node_count=3, num_partitions=2, directed=True
    )
    out2 = bellman_ford(g2, source_id=0).set_index("node")
    assert (out2["negative_cycle"] == 0).all()
    assert out2.loc[2, "distance"] == 1.0


def test_triangle_stream_matches_brute(graph_from_edges):
    import itertools

    from graph_data_science_ray.functions.triangles import triangle_stream

    edge_list = list(itertools.combinations(range(5), 2)) + [(5, 6), (6, 7), (7, 5)]
    _, _, idmap, _, sym = graph_from_edges(edge_list)
    df = triangle_stream(sym, idmap=idmap, num_partitions=2).to_pandas()
    keys = idmap.keys
    got = sorted(
        (keys[a], keys[b], keys[c])
        for a, b, c in zip(df["a"], df["b"], df["c"])
    )
    # brute force over the undirected edge set
    adj = set()
    for u, v in edge_list:
        adj.add((f"role:n{u:04d}", f"role:n{v:04d}"))
        adj.add((f"role:n{v:04d}", f"role:n{u:04d}"))
    nodes = sorted({x for e in adj for x in e})
    want = sorted(
        (x, y, z)
        for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in adj and (y, z) in adj and (x, z) in adj
    )
    assert got == want
    # each triangle exactly once, corners ascending
    assert all(a < b < c for a, b, c in got)


def test_kge_topk_planted():
    from graph_data_science_ray.functions.kge import kge_topk

    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(8)), pa.int64()),
                "embedding": pa.array(
                    [[float(i), 0.0] for i in range(8)],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    # heads {0}, relation = 0.1 * e1 = [0.1, 0]; h + r = [0.1, 0] so
    # TransE ranks targets by |i - 0.1|: 1 is the nearest non-self hit
    out = kge_topk(emb, np.array([0]), rel_id=1, rel_scale=0.1, k=3,
                   score="transe")
    assert out["target_id"].tolist() == [1, 2, 3]
    assert out["rank"].tolist() == [1, 2, 3]
    # DistMult with h = 0-vector scores every target 0 -> id-asc ties
    out2 = kge_topk(emb, np.array([0]), rel_id=1, rel_scale=0.1, k=3,
                    score="distmult")
    assert out2["target_id"].tolist() == [1, 2, 3]
