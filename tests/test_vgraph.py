"""vgraph literal codec (operators/graph.py parse_vgraph/format_vgraph)
— the reference's value-level IO (vgraph_in/out, types_core.c:459-686)
with its exact error contracts."""

from __future__ import annotations

import pytest

from neurondb_spark.operators.graph import (
    bfs,
    format_vgraph,
    parse_vgraph,
    vgraph_edges_df,
)


def test_roundtrip():
    lit = "{nodes:5,edges:[[0,1],[1,2],[3,4]]}"
    n, e = parse_vgraph(lit)
    assert (n, e) == (5, [(0, 1), (1, 2), (3, 4)])
    assert format_vgraph(n, e) == lit


def test_whitespace_tolerated():
    n, e = parse_vgraph("  { nodes: 3 , edges: [ [ 0 , 1 ] , [1 ,2] ] }  ")
    assert (n, e) == (3, [(0, 1), (1, 2)])


def test_no_edges_section():
    assert parse_vgraph("{nodes:4}") == (4, [])
    assert parse_vgraph("{nodes:2,edges:[]}") == (2, [])


def test_error_contracts():
    with pytest.raises(ValueError, match="must start with"):
        parse_vgraph("nodes:3")
    with pytest.raises(ValueError, match="must specify nodes"):
        parse_vgraph("{edges:[[0,1]]}")
    with pytest.raises(ValueError, match="must specify nodes"):
        parse_vgraph("{nodes:0}")
    with pytest.raises(ValueError, match="out of range"):
        parse_vgraph("{nodes:2,edges:[[0,5]]}")
    with pytest.raises(ValueError, match="out of range"):
        parse_vgraph("{nodes:2,edges:[[-1,0]]}")
    with pytest.raises(ValueError, match="between edge nodes"):
        parse_vgraph("{nodes:2,edges:[[0 1]]}")
    with pytest.raises(ValueError, match="edges must be an array"):
        parse_vgraph("{nodes:2,edges:0}")


def test_edges_df_feeds_algorithms(spark):
    df = vgraph_edges_df(spark, "{nodes:4,edges:[[0,1],[1,2],[2,3]]}")
    out = {r["node"]: r["depth"] for r in bfs(df, 0, max_depth=3).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}


def test_empty_edges_df(spark):
    df = vgraph_edges_df(spark, "{nodes:3}")
    assert df.count() == 0 and df.columns == ["src", "dst"]
