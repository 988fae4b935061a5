"""WL color refinement + Luby MIS vs brute-force references."""

import hashlib

import numpy as np

from graph_data_science_ray.functions.mis import maximal_independent_set
from graph_data_science_ray.functions.wl import wl_colors, wl_partition_sizes

EDGES = [
    (0, 1),
    (1, 2),
    (2, 0),
    (2, 3),
    (3, 4),
    (4, 5),
    (5, 3),
    (6, 7),
]


def _adj(idmap, sym):
    df = sym.to_pandas()
    n = len(idmap.keys)
    adj = [set() for _ in range(n)]
    for s, d in zip(df["src"], df["dst"]):
        adj[int(s)].add(int(d))
    return adj


def _u(prefix, v, hex_chars):
    return int(hashlib.md5(f"{prefix}{v}".encode()).hexdigest()[:hex_chars], 16)


def _wl_brute(adj, rounds):
    n = len(adj)
    c0 = _u("wl:", "init", 12)
    color = [c0] * n
    for _ in range(rounds):
        h = [_u("wlh:", c, 9) for c in color]
        color = [
            _u("wlc:", f"{color[v]}:{sum(h[u] for u in adj[v])}", 12)
            for v in range(n)
        ]
    return color


def _mis_brute(adj, rounds):
    n = len(adj)
    pri = [_u("mis:", i, 12) for i in range(n)]
    status = [0] * n
    for _ in range(rounds):
        sel = [
            v
            for v in range(n)
            if status[v] == 0
            and all(status[u] != 0 or pri[v] < pri[u] for u in adj[v])
        ]
        for v in sel:
            status[v] = 1
        for v in range(n):
            if status[v] == 0 and any(status[u] == 1 for u in adj[v]):
                status[v] = 2
        if all(s != 0 for s in status):
            break
    return status


def test_wl_matches_brute_force(graph_from_edges):
    _, gu, idmap, _, sym = graph_from_edges(EDGES, isolated=[8])
    got = wl_colors(gu, rounds=3).sort_values("node").reset_index(drop=True)
    adj = _adj(idmap, sym)
    want = _wl_brute(adj, 3)
    # idmap.keys is sorted, so dense id order == sorted node order
    assert list(got["color"]) == want


def test_wl_distinguishes_structure(graph_from_edges):
    # triangle nodes (n0,n1,n2 minus the bridge n2) vs path/pendant nodes
    _, gu, idmap, _, sym = graph_from_edges(EDGES, isolated=[8])
    got = wl_colors(gu, rounds=3)
    by_key = dict(zip(got["node"], got["color"]))
    # n6 and n7 are a symmetric pendant pair: identical WL colors forever
    assert by_key["role:n0006"] == by_key["role:n0007"]
    # the isolated node is in its own cell, distinct from the pendant pair
    assert by_key["role:n0008"] != by_key["role:n0006"]
    # refinement is consistent with the histogram readout
    hist = wl_partition_sizes(gu, rounds=3)
    assert int(hist["n"].sum()) == len(got)


def test_wl_round_zero_is_init(graph_from_edges):
    _, gu, idmap, _, _ = graph_from_edges(EDGES)
    got = wl_colors(gu, rounds=0)
    assert set(got["color"]) == {_u("wl:", "init", 12)}


def test_mis_matches_brute_force(graph_from_edges):
    _, gu, idmap, _, sym = graph_from_edges(EDGES, isolated=[8])
    got = maximal_independent_set(gu, rounds=8).sort_values("node")
    adj = _adj(idmap, sym)
    want = _mis_brute(adj, 8)
    assert list(got["status"]) == want


def test_mis_is_maximal_and_independent(graph_from_edges):
    _, gu, idmap, _, sym = graph_from_edges(EDGES, isolated=[8])
    got = maximal_independent_set(gu, rounds=16).sort_values("node")
    status = got["status"].to_numpy()
    adj = _adj(idmap, sym)
    assert set(status) <= {1, 2}  # converged: nothing undecided
    in_set = {v for v, s in enumerate(status) if s == 1}
    for v in in_set:  # independence
        assert not (adj[v] & in_set)
    for v, s in enumerate(status):  # maximality: every OUT node has a reason
        if s == 2:
            assert adj[v] & in_set
    # isolated node is always selected
    iso = list(idmap.keys).index("role:n0008")
    assert status[iso] == 1


def test_ldp_matches_brute_force(graph_from_edges):
    from graph_data_science_ray.functions.degree import local_degree_profile

    _, gu, idmap, _, sym = graph_from_edges(EDGES, isolated=[8])
    got = local_degree_profile(sym, idmap=idmap)
    adj = _adj(idmap, sym)
    deg = [len(a) for a in adj]
    for v in range(len(adj)):
        row = got.iloc[v]
        nd = sorted(deg[u] for u in adj[v])
        assert row["degree"] == deg[v]
        assert row["nbr_min"] == (nd[0] if nd else 0)
        assert row["nbr_max"] == (nd[-1] if nd else 0)
        assert row["nbr_sum"] == sum(nd)
        assert row["nbr_sumsq"] == sum(d * d for d in nd)


def test_salsa_matches_brute_force(graph_from_edges):
    from graph_data_science_ray.functions.hits import salsa
    from graph_data_science_ray.pipelines.transforms import reverse_edges
    import graph_data_science_ray as gdsr

    gd, gu, idmap, enc, sym = graph_from_edges(EDGES, isolated=[8])
    grev = gdsr.GraphStore.project(
        reverse_edges(enc), str(gd.path) + "_rev", idmap=idmap,
        directed=True, boundaries=gd.boundaries,
    )
    got = salsa(gd, grev, iterations=3, scale=1 << 20).sort_values("node")
    # brute force on the directed unique edge set
    df = enc.to_pandas()
    n = len(idmap.keys)
    out_edges = [[] for _ in range(n)]
    in_edges = [[] for _ in range(n)]
    for s, d in zip(df["src"], df["dst"]):
        out_edges[int(s)].append(int(d))
        in_edges[int(d)].append(int(s))
    hub = [1 << 20] * n
    auth = [0] * n
    for _ in range(3):
        auth = [
            sum(hub[u] // len(out_edges[u]) for u in in_edges[v])
            for v in range(n)
        ]
        hub = [
            sum(auth[v] // len(in_edges[v]) for v in out_edges[u])
            for u in range(n)
        ]
    assert list(got["hub"]) == hub
    assert list(got["auth"]) == auth


def test_seeded_propagation_matches_brute_force(graph_from_edges):
    from graph_data_science_ray.functions.spread import seeded_propagation

    _, gu, idmap, _, sym = graph_from_edges(EDGES, isolated=[8])
    S, MOD, R = 1 << 20, 3, 4
    got = seeded_propagation(gu, rounds=R, scale=S, seed_modulus=MOD)
    adj = _adj(idmap, sym)
    n = len(adj)
    x = [S if v % MOD == 0 else 0 for v in range(n)]
    for _ in range(R):
        nxt = [
            S if v % MOD == 0
            else sum(x[u] // len(adj[u]) for u in adj[v])
            for v in range(n)
        ]
        x = nxt
    assert list(got.sort_values("node")["score"]) == x
    # seeds stay clamped; isolated non-seed stays dark
    assert x[0] == S


def _matching_brute(adj_pairs, rounds):
    import hashlib as _h

    def pri(i, j):
        return int(_h.md5(f"mm:{i}:{j}".encode()).hexdigest()[:12], 16)

    edges = {(i, j): pri(i, j) for (i, j) in adj_pairs}
    matched = []
    for _ in range(rounds):
        if not edges:
            break
        mn = {}
        for (i, j), p in edges.items():
            mn[i] = min(mn.get(i, p), p)
            mn[j] = min(mn.get(j, p), p)
        sel = [(i, j) for (i, j), p in edges.items()
               if p == mn[i] and p == mn[j]]
        if not sel:
            break
        matched.extend(sel)
        dead = {x for e in sel for x in e}
        edges = {e: p for e, p in edges.items()
                 if e[0] not in dead and e[1] not in dead}
    return sorted(matched)


def test_maximal_matching_matches_brute_force(graph_from_edges):
    from graph_data_science_ray.functions.matching import maximal_matching

    _, gu, idmap, _, sym = graph_from_edges(EDGES, isolated=[8])
    got = maximal_matching(sym, rounds=4)
    pairs = sorted(zip(got["src"].astype(int), got["dst"].astype(int)))
    df = sym.to_pandas()
    canon = sorted({(int(s), int(d)) for s, d in zip(df["src"], df["dst"])
                    if int(s) < int(d)})
    want = _matching_brute(canon, 4)
    assert pairs == want
    # result is a matching (no shared nodes) and maximal on the fixture
    nodes = [x for e in pairs for x in e]
    assert len(nodes) == len(set(nodes))
    matched_set = set(nodes)
    for (i, j) in canon:
        assert i in matched_set or j in matched_set  # maximality


def test_triad_census_matches_brute_force(graph_from_edges):
    from itertools import combinations

    from graph_data_science_ray.functions.matching import maximal_matching  # noqa: F401
    from graph_data_science_ray.functions.graph_stats import triad_census

    gd, gu, idmap, enc, sym = graph_from_edges(EDGES, isolated=[8])
    n = len(idmap.keys)
    got = triad_census(enc, sym, node_count=n).iloc[0]
    adj = _adj(idmap, sym)
    # brute-force triad classes
    cnt = {"closed": 0, "wedge": 0, "one": 0, "empty": 0}
    for a, b, c in combinations(range(n), 3):
        e = (b in adj[a]) + (c in adj[a]) + (c in adj[b])
        cnt[["empty", "one", "wedge", "closed"][e]] += 1
    assert got["tri_closed"] == cnt["closed"]
    assert got["tri_wedge"] == cnt["wedge"]
    assert got["tri_one_edge"] == cnt["one"]
    assert got["tri_empty"] == cnt["empty"]
    # dyads: directed edge list from enc
    df = enc.to_pandas()
    dirs = {(int(s), int(d)) for s, d in zip(df["src"], df["dst"])}
    mut = sum(1 for (s, d) in dirs if s < d and (d, s) in dirs)
    linked = len({(min(s, d), max(s, d)) for (s, d) in dirs})
    assert got["dyad_mut"] == mut
    assert got["dyad_asym"] == linked - mut
    assert got["dyad_null"] == n * (n - 1) // 2 - linked


def test_robustness_profile_brute(graph_from_edges):
    import hashlib as _h

    from graph_data_science_ray.functions.graph_stats import robustness_profile

    _, gu, idmap, enc, sym = graph_from_edges(EDGES, isolated=[8])
    got = robustness_profile(sym, p_ppms=(300_000, 1_000_000))
    df = sym.to_pandas()
    canon = sorted({(int(s), int(d)) for s, d in zip(df["src"], df["dst"])
                    if int(s) < int(d)})
    for _, row in got.iterrows():
        p = int(row["p_ppm"])
        kept = []
        for (i, j) in canon:
            u32 = int(_h.md5(f"rb:{i}:{j}".encode()).hexdigest()[:8], 16)
            if u32 * 1_000_000 < p * 4_294_967_296:
                kept.append((i, j))
        assert row["n_edges"] == len(kept)
        # brute components over touched nodes
        nodes = sorted({x for e in kept for x in e})
        parent = {v: v for v in nodes}

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        for (i, j) in kept:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
        comps = {}
        for v in nodes:
            comps.setdefault(find(v), []).append(v)
        assert row["n_nodes"] == len(nodes)
        assert row["n_components"] == len(comps)
        if comps:
            assert row["giant"] == max(len(c) for c in comps.values())
    # p = 1e6 keeps everything
    full = got[got["p_ppm"] == 1_000_000].iloc[0]
    assert full["n_edges"] == len(canon)


def test_coarsen_graph_brute(graph_from_edges):
    from graph_data_science_ray.functions.matching import (
        coarsen_graph, maximal_matching)

    _, gu, idmap, _, sym = graph_from_edges(EDGES, isolated=[8])
    coarse, matched = coarsen_graph(sym, rounds=4)
    cdf = (coarse.to_pandas().sort_values(["src", "dst"])
           .reset_index(drop=True))
    # brute: same mapping, same aggregation
    m = maximal_matching(sym, rounds=4)
    rep = dict(zip(m["dst"].astype(int), m["src"].astype(int)))
    df = sym.to_pandas()
    agg = {}
    for s, d, w in zip(df["src"].astype(int), df["dst"].astype(int),
                       df["weight"].astype(float)):
        rs, rd_ = rep.get(s, s), rep.get(d, d)
        if rs != rd_:
            agg[(rs, rd_)] = agg.get((rs, rd_), 0.0) + w
    want = sorted(agg.items())
    got = list(zip(zip(cdf["src"].astype(int), cdf["dst"].astype(int)),
                   cdf["weight"].astype(float)))
    assert got == want
    # coarse graph is still symmetric and strictly smaller
    pairs = {(s, d) for (s, d), _ in want}
    assert all((d, s) in pairs for (s, d) in pairs)
    n_coarse = len({x for p in pairs for x in p})
    n_orig = len({x for c in (df["src"], df["dst"]) for x in c.astype(int)})
    assert n_coarse < n_orig


def test_densest_subgraph_profile_brute(graph_from_edges):
    from graph_data_science_ray.functions.graph_stats import (
        densest_subgraph_profile)

    _, gu, idmap, _, sym = graph_from_edges(EDGES, isolated=[8])
    got = densest_subgraph_profile(sym, rounds=6)
    df = sym.to_pandas()
    pairs = {(int(s), int(d)) for s, d in zip(df["src"], df["dst"])
             if int(s) < int(d)}
    want = []
    r = 0
    while pairs and r < 6:
        deg = {}
        for (i, j) in pairs:
            deg[i] = deg.get(i, 0) + 1
            deg[j] = deg.get(j, 0) + 1
        V, E = len(deg), len(pairs)
        thr = (2 * E) // V
        want.append((r, V, E, thr, E * 1_000_000 // V))
        dead = {v for v, d in deg.items() if d <= thr}
        pairs = {(i, j) for (i, j) in pairs
                 if i not in dead and j not in dead}
        r += 1
    got_rows = [tuple(int(x) for x in row)
                for row in got.itertuples(index=False)]
    assert got_rows == want
    # density never decreases until the peel empties (on this fixture the
    # triangle survives round 0)
    assert want[0][1] > want[-1][1] or len(want) == 1


def test_hem_matching_prefers_heavy_edges(graph_from_edges):
    import hashlib as _h

    from graph_data_science_ray.functions.matching import (
        _W_CAP, maximal_matching)

    # duplicate edges raise derived weights: (0,1) appears 3x -> weight 6
    # after symmetrize (3 forward + 3 reverse summed)
    edges = [(0, 1), (0, 1), (0, 1), (1, 2), (2, 0), (3, 4)]
    _, gu, idmap, enc, sym = graph_from_edges(edges)
    got = maximal_matching(sym, rounds=4, weighted=True)
    pairs = sorted(zip(got["src"].astype(int), got["dst"].astype(int)))
    # brute force with the same priority formula
    df = sym.to_pandas()
    agg = {}
    for st, dt, w in zip(df["src"].astype(int), df["dst"].astype(int),
                         df["weight"].astype(float)):
        if st < dt:
            agg[(st, dt)] = w

    def pri(i, j, w):
        h = int(_h.md5(f"mm:{i}:{j}".encode()).hexdigest()[:10], 16)
        return ((1 << 20) - min(int(w), _W_CAP)) * (1 << 40) + h

    edges_p = {e: pri(*e, w) for e, w in agg.items()}
    matched = []
    for _ in range(4):
        if not edges_p:
            break
        mn = {}
        for (i, j), p in edges_p.items():
            mn[i] = min(mn.get(i, p), p)
            mn[j] = min(mn.get(j, p), p)
        sel = [(i, j) for (i, j), p in edges_p.items()
               if p == mn[i] and p == mn[j]]
        if not sel:
            break
        matched.extend(sel)
        dead = {x for e in sel for x in e}
        edges_p = {e: p for e, p in edges_p.items()
                   if e[0] not in dead and e[1] not in dead}
    assert pairs == sorted(matched)
    # the heavy (0,1) edge must be in the matching (beats its neighbors)
    assert (0, 1) in pairs


def test_ds_variants_match_wrappers(graph_from_edges):
    from graph_data_science_ray.functions.mis import (
        maximal_independent_set, maximal_independent_set_ds)
    from graph_data_science_ray.functions.spread import (
        seeded_propagation, seeded_propagation_ds)
    from graph_data_science_ray.functions.wl import wl_colors, wl_colors_ds

    _, gu, idmap, _, _ = graph_from_edges(EDGES, isolated=[8])
    wl = wl_colors(gu, rounds=2)
    wl_d = wl_colors_ds(gu, rounds=2).to_pandas().sort_values("node")
    assert list(wl_d["color"].astype(int)) == list(wl["color"].astype(int))
    mis = maximal_independent_set(gu, rounds=6)
    mis_d = (maximal_independent_set_ds(gu, rounds=6)
             .to_pandas().sort_values("node"))
    assert list(mis_d["status"].astype(int)) == list(mis["status"].astype(int))
    sp = seeded_propagation(gu, rounds=3)
    sp_d = (seeded_propagation_ds(gu, rounds=3)
            .to_pandas().sort_values("node"))
    assert list(sp_d["score"].astype(int)) == list(sp["score"].astype(int))
