"""Filter expression AST (reference ExpressionParser surface): parsing,
vectorized evaluation, and the subgraph_filter integration."""

import numpy as np
import pytest

from graph_data_science_ray.pipelines.filter_expr import (
    evaluate_edge_filter,
    evaluate_node_filter,
    labels_in,
    parse_expression,
)


def test_comparisons_and_boolean_ops():
    props = {"score": np.array([1.0, 2.5, 3.0, 4.0]),
             "age": np.array([10, 20, 30, 40])}
    cases = [
        ("n.score > 2.5", [False, False, True, True]),
        ("n.score >= 2.5", [False, True, True, True]),
        ("n.score < 3", [True, True, False, False]),
        ("n.score <= 1", [True, False, False, False]),
        ("n.score = 2.5", [False, True, False, False]),
        ("n.score <> 2.5", [True, False, True, True]),
        ("n.score > 1 AND n.age < 40", [False, True, True, False]),
        ("n.score <= 1 OR n.age = 40", [True, False, False, True]),
        ("NOT n.score > 2.5", [True, True, False, False]),
        ("NOT (n.score > 1 AND n.age < 40)", [True, False, False, True]),
        ("n.score > 0 AND n.score < 5 AND n.age <> 20",
         [True, False, True, True]),
    ]
    for expr, want in cases:
        got = evaluate_node_filter(expr, props)
        assert got.tolist() == want, expr


def test_label_checks_and_strings():
    props = {"key": np.array(["role:1", "tool:2", "role:3"])}
    labels = {"role": np.array([True, False, True]),
              "tool": np.array([False, True, False])}
    assert evaluate_node_filter("n:role", props, labels).tolist() == [
        True, False, True]
    assert evaluate_node_filter(
        "n:tool OR n.key = 'role:3'", props, labels
    ).tolist() == [False, True, True]
    # unknown label: all-false of the right length (reference: no node
    # carries it), not an error
    assert evaluate_node_filter("n:ghost", props, labels,
                                n_rows=3).tolist() == [False] * 3


def test_edge_filter_and_type_check():
    props = {"weight": np.array([1.0, 2.0, 3.0]),
             "src": np.array([0, 1, 2]), "dst": np.array([1, 1, 0])}
    # row 1 is a self-loop (src == dst == 1) so NOT r.src = r.dst drops it
    assert evaluate_edge_filter(
        "r.weight >= 2 AND NOT r.src = r.dst", props
    ).tolist() == [False, False, True]
    types = {"KNOWS": np.array([True, True, False])}
    assert evaluate_edge_filter(
        "r:KNOWS AND r.weight > 1", props, types
    ).tolist() == [False, True, False]


def test_parse_errors_and_label_walk():
    with pytest.raises(ValueError):
        parse_expression("n.score >")
    with pytest.raises(ValueError):
        parse_expression("score > 3")  # bare identifier
    with pytest.raises(ValueError):
        parse_expression("n.a > 1 ??")
    ast = parse_expression("n:A AND (n:B OR NOT n:C) AND n.x > 1")
    assert labels_in(ast) == {"A", "B", "C"}


def test_subgraph_filter_ast_integration(graph_from_edges):
    from graph_data_science_ray.pipelines.transforms import subgraph_filter

    edges = [(0, 1), (0, 1), (1, 2), (2, 3), (3, 0)]
    _gd, _gu, idmap, enc, _sym = graph_from_edges(edges)
    # edge AST filter: weight >= 2 keeps only the duplicated (0,1) edge
    ds, im2 = subgraph_filter(enc, idmap, edge_filter="r.weight >= 2")
    out = ds.to_pandas()
    assert len(out) == 1 and out["weight"].iloc[0] == 2.0
    # node AST filter via key property: drop node 3's key
    key3 = idmap.keys[3]
    ds2, im3 = subgraph_filter(
        enc, idmap, node_filter=f"NOT n.key = '{key3}'"
    )
    assert len(im3) == len(idmap) - 1
    out2 = ds2.to_pandas()
    assert len(out2) == 2  # (2,3) and (3,0) dropped with node 3
    # label check: all keys share the role prefix => everything kept
    ds3, im4 = subgraph_filter(enc, idmap, node_filter="n:role")
    assert len(im4) == len(idmap)
