"""CLI — `python -m graph_data_science_ray <command>`.

The ray-job-submit entry point: each command is a complete pipeline
(project a transcript table, run an algorithm over a projected graph,
write results as partitioned parquet). Owns its Ray session.

Examples:
  python -m graph_data_science_ray project \\
      --transcripts /data/transcripts --out /data/graph --partitions 64
  python -m graph_data_science_ray pagerank \\
      --graph /data/graph --out /data/ranks --checkpoint /data/ck
  python -m graph_data_science_ray wcc --graph /data/graph-sym --out /data/cc
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(args):
    import warnings

    warnings.filterwarnings("ignore")
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_project(args) -> dict:
    import graph_data_science_ray as gdsr
    from graph_data_science_ray.pipelines.edges import derive_edges_encoded_grouped

    ts = gdsr.read_transcripts(
        args.transcripts, columns=["conv_id", "turn_idx", "role", "tool"]
    )
    turns = gdsr.derive_turns(ts).materialize()
    idmap = gdsr.IdMap.from_turns(turns)
    enc = derive_edges_encoded_grouped(turns, idmap).materialize()
    if args.undirected:
        enc = gdsr.symmetrize(enc).materialize()
    g = gdsr.GraphStore.project(
        enc, args.out, idmap=idmap, num_partitions=args.partitions,
        directed=not args.undirected, overwrite=not args.resume,
    )
    return {"graph": args.out, "nodes": g.node_count, "edges": g.edge_count,
            "partitions": g.num_partitions}


def _load(args):
    import graph_data_science_ray as gdsr

    return gdsr.GraphStore.load(args.graph)


def cmd_pagerank(args) -> dict:
    import graph_data_science_ray as gdsr
    from graph_data_science_ray.functions.pagerank import PageRankComputation
    from graph_data_science_ray.sinks import write_results
    from graph_data_science_ray.state.pregel import Pregel, TerminationFlag

    g = _load(args)
    flag = TerminationFlag(args.stop_file) if args.stop_file else None
    comp = PageRankComputation(args.damping, args.tolerance, args.weighted)
    engine = Pregel(g, comp, args.checkpoint, termination_flag=flag)
    refs = engine.run(max_iterations=args.max_iterations, resume=True)
    import numpy as np
    import pandas as pd

    scores = engine.gather(refs, "rank")
    node = g.idmap.keys if g.idmap is not None else np.arange(g.node_count)
    res = pd.DataFrame({"node": node, "score": scores})
    write_results(res, args.out)
    return {"out": args.out, "rows": len(res),
            "iterations": len(engine.history),
            "stopped": bool(flag and not flag.running())}


def cmd_wcc(args) -> dict:
    import graph_data_science_ray as gdsr
    from graph_data_science_ray.sinks import write_results

    g = _load(args)
    res = gdsr.wcc(g, checkpoint_dir=args.checkpoint, resume=True)
    write_results(res, args.out)
    return {"out": args.out, "rows": len(res), "components": int(res["component"].nunique())}


def cmd_labelprop(args) -> dict:
    import graph_data_science_ray as gdsr
    from graph_data_science_ray.sinks import write_results

    g = _load(args)
    res = gdsr.label_propagation(
        g, max_iterations=args.max_iterations, checkpoint_dir=args.checkpoint,
        resume=True,
    )
    write_results(res, args.out)
    return {"out": args.out, "rows": len(res), "labels": int(res["label"].nunique())}


def cmd_triangles(args) -> dict:
    import ray.data as rd

    from graph_data_science_ray.functions.triangles import triangle_count
    from graph_data_science_ray.sinks import write_results

    g = _load(args)
    edges = rd.read_parquet(args.edges)  # the symmetrized edge parquet
    tri, total = triangle_count(edges, idmap=g.idmap, node_count=g.node_count)
    write_results(tri, args.out)
    return {"out": args.out, "global_triangles": int(total)}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="graph_data_science_ray")
    p.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("project")
    pp.add_argument("--transcripts", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--partitions", type=int, default=32)
    pp.add_argument("--undirected", action="store_true")
    pp.add_argument("--resume", action="store_true")
    pp.set_defaults(fn=cmd_project)

    for name, fn in (("pagerank", cmd_pagerank), ("wcc", cmd_wcc),
                     ("labelprop", cmd_labelprop)):
        sp = sub.add_parser(name)
        sp.add_argument("--graph", required=True)
        sp.add_argument("--out", required=True)
        sp.add_argument("--checkpoint", default=None)
        sp.add_argument("--max-iterations", type=int, default=20,
                        dest="max_iterations")
        if name == "pagerank":
            sp.add_argument("--damping", type=float, default=0.85)
            sp.add_argument("--tolerance", type=float, default=1e-7)
            sp.add_argument("--weighted", action="store_true")
            # external cancellation: touch this file to stop gracefully
            # between supersteps (reference TerminationFlag)
            sp.add_argument("--stop-file", default=None, dest="stop_file")
        sp.set_defaults(fn=fn)

    st = sub.add_parser("triangles")
    st.add_argument("--graph", required=True)
    st.add_argument("--edges", required=True)
    st.add_argument("--out", required=True)
    st.set_defaults(fn=cmd_triangles)

    args = p.parse_args(argv)
    _session(args)
    try:
        out = args.fn(args)
    finally:
        import ray

        ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
