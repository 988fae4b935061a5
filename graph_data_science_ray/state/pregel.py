"""BSP gather-scatter kernel — the engine's Pregel.

The reference's Pregel (pregel/src/main/java/org/neo4j/gds/beta/pregel/Pregel.java:61-216)
runs shared-memory supersteps with a reducing messenger
(ReducingMessenger.java:36-106) and vote-to-halt bits. The distributed
re-expression here:

- graph state lives in per-partition **numpy state dicts** held as Ray
  object refs (functional BSP: each superstep maps old state refs to new
  state refs; Ray lineage gives fault tolerance for free);
- a superstep is ``P`` scatter tasks (vectorized contribution → map-side
  pre-reduction via the partition's precomputed scatter index →
  ``num_returns=P`` partition-addressed message arrays) followed by ``P``
  apply tasks (each consuming exactly the refs addressed to it — messages
  never touch the driver). This is the "partition-addressed reduce"
  realization of the ``groupby(dst).aggregate(sum|min|max)`` shuffle
  (SURVEY.md §2.2): the Reducer contract means messages are pre-combined
  map-side, the single most important optimization at 10^12-edge scale;
- messages are combined in **fixed partition order** with a fixed
  partition count, so float64 reductions are bit-identical at any
  parallelism level (the determinism contract, SURVEY.md §4);
- every ``checkpoint_interval`` supersteps each partition persists its
  state (npz, atomic rename) plus a lineage record
  ``{iteration, partition, rows, blake2b digest}``; an iteration manifest
  commits the superstep; ``run`` resumes from the newest committed
  iteration. The reference has **no** mid-algorithm checkpointing
  (SURVEY.md §3.3) — this is a north-rule addition.

Skew / hub handling (the north star's "mirror vertices"): source-side
hubs are isolated by the degree-balanced partition boundaries (a hub's
adjacency never exceeds one partition's edge budget by more than its own
degree); destination-side hubs are bounded by construction — each source
partition pre-reduces its messages per destination, so a hub receives at
most P partials per superstep regardless of in-degree. That map-side
pre-reduction IS the delta-encoded-mirror-vertex scheme: the P partials
are the mirrors, and the fixed-order apply-side combine is the mirror
merge; no separate mirror bookkeeping is needed because the reducer
algebra (sum/min/or) is associative.

Reducer kinds:
- ``sum`` / ``min``: dense float64/int64 exchange, ``np.add/np.minimum``
  reduceat map-side and fixed-order combine apply-side.
- ``vote``: (dst, label, weight) triples pre-combined per (dst, label)
  map-side; apply-side tally with max-weight / min-label argmax — the one
  non-reducer shuffle (label propagation).
- ``queue``: NO map-side reduction — every edge message is delivered
  raw, mirroring the reference's ``SyncQueueMessenger``
  (pregel/src/main/java/org/neo4j/gds/beta/pregel/Pregel.java:152-158):
  the apply side receives the destination-sorted message stream
  (deterministic order: fixed source-partition order, stable dst sort)
  through ``PregelComputation.apply_queues``. This is the completion of
  the extension API for algorithms whose combine is not associative
  (medians, exact SLLPA memory, sampling); it costs the full O(E)
  message volume per superstep, which is why it is not the default.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import ray

from graph_data_science_ray._util import atomic_write_json, read_json


class PregelComputation:
    """Extension surface: subclass and plug into ``Pregel.run``.

    Mirrors the reference's ``PregelComputation`` user API
    (pregel/src/main/java/org/neo4j/gds/beta/pregel/PregelComputation.java).
    Instances must be small and picklable (they ship to tasks).
    """

    reducer: str = "sum"  # "sum" | "min" | "vote"
    weighted: bool = False
    # how an edge transforms the message value in flight:
    #   "none" (value as-is), "multiply" (value * weight  — e.g. weighted
    #   PageRank), "add" (value + weight — shortest paths), "add_one"
    #   (value + 1 — hop counts). ``weighted=True`` is shorthand kept for
    #   multiply-style computations.
    edge_combine: str = "none"
    # message identity / dtype for the min reducer
    message_dtype: str = "int64"
    # vector-message width (2-D sum/min). Declaring it lets an apply task
    # whose inbox is all-None (no in-edges this superstep) still size its
    # accumulator (n_local, width) instead of falling back to 1-D.
    message_width: int | None = None
    # Wire precision for sum-reducer payloads: "float64" (default) or
    # "float32" — the scale lever that halves per-superstep message bytes
    # on the DRAM/network-bound scatter. Map-side reduction still runs in
    # float64; only the reduced per-destination values narrow before
    # shipping, and the apply-side accumulator stays float64. OPT-IN
    # ONLY: results drift ~1e-7 per superstep from the float64 wire, so
    # the 1e-6 reference-conformance contract requires the default.
    message_precision: str = "float64"
    # Async (same-superstep) message delivery — the reference's
    # AsyncQueueMessenger (pregel/.../AsyncQueueMessenger.java:24),
    # re-expressed for BSP shuffles: messages between nodes of the SAME
    # partition are relaxed to a partition-local fixpoint inside the apply
    # task before the next global shuffle (block-asynchronous execution).
    # OPT-IN and only honored for scalar min-reducer computations whose
    # fixpoint is schedule-independent (monotone relaxation: WCC hash-min,
    # SSSP Bellman-Ford) — the converged output is then byte-identical to
    # sync mode while global supersteps drop from O(graph diameter) to
    # O(diameter of the partition quotient graph), i.e. fewer all-to-all
    # shuffles on a real cluster. ``active_state_key`` names the state
    # mask the engine rewrites to changed-THIS-SUPERSTEP after the local
    # rounds (the next scatter must re-announce every node improved at
    # any point of the superstep, not just the last local round).
    async_local: bool = False
    active_state_key: str = "changed"

    def init_state(self, block: dict) -> dict:
        raise NotImplementedError

    def message_values(self, state: dict, block: dict):
        """Return (per-local-node value array, active bool mask)."""
        raise NotImplementedError

    def vote_node_weights(self, state: dict, block: dict):
        """Optional per-local-node vote multiplier (vote reducer only).

        The reference's vote weight is ``relationshipWeight *
        nodeWeight(neighbor)`` (labelpropagation/ComputeStepConsumer.java:49-58);
        return the sender-side nodeWeight array to enable the second
        factor, or None (default) for nodeWeight ≡ 1."""
        return None

    def apply_messages(self, state: dict, acc, received, block: dict) -> dict:
        """Mutate state with reduced messages; return per-partition stats."""
        raise NotImplementedError

    def apply_queues(self, state: dict, msg_dst, msg_vals, received,
                     block: dict) -> dict:
        """Queue-reducer apply: raw messages, destination-sorted.

        ``msg_dst`` is the LOCAL destination index per message (ascending,
        so per-node runs are contiguous — ``np.flatnonzero(np.diff(...))``
        or ``np.unique(..., return_index=True)`` yields the queue
        boundaries); ``msg_vals`` aligns with it. Message order within a
        destination is deterministic (fixed source-partition order)."""
        raise NotImplementedError

    def is_converged(self, stats: dict) -> bool:
        raise NotImplementedError

    def master_compute(self, stats: dict, superstep: int) -> bool:
        """Reference BasePregelComputation.masterCompute — called exactly
        once on the driver after every superstep; return True to halt
        (in ADDITION to ``is_converged``). Runs single-threaded with the
        aggregated superstep stats, the reference's master-compute
        contract. Driver-side mutations of ``self`` are NOT shipped to
        workers mid-run (the computation object is broadcast once);
        algorithms that need per-superstep re-broadcast state should
        drive the loop with :meth:`Pregel.step` instead (the HITS
        pattern). With lookahead pipelining a halt wastes at most
        ``lookahead`` speculative supersteps, same as ``is_converged``.
        """
        return False


# ---------------------------------------------------------------------------
# remote kernels
# ---------------------------------------------------------------------------


def _min_identity(comp):
    return np.inf if comp.message_dtype == "float64" else np.iinfo(np.int64).max


@ray.remote
def _init_state(comp: PregelComputation, block: dict) -> dict:
    return comp.init_state(block)


def _scatter_reduced(comp, block, state, num_parts, bounds):
    vals, active = comp.message_values(state, block)
    deg = block["degrees"]
    perm, run_starts = block["perm"], block["run_starts"]
    uniq_dst, part_slices = block["uniq_dst"], block["part_slices"]
    n_msgs = int(deg[active].sum()) if active is not None else int(deg.sum())
    if len(uniq_dst) == 0 or n_msgs == 0:
        return [None, 0]
    src_idx = block["src_idx"]
    if comp.reducer == "sum":
        if vals.ndim == 2:  # vector messages (e.g. FastRP embeddings)
            send = vals.astype(np.float64) * active[:, None]
            edge_vals = send[src_idx]
            if comp.weighted or comp.edge_combine == "multiply":
                edge_vals = edge_vals * block["w_sorted"][:, None]
            reduced = np.add.reduceat(edge_vals, run_starts, axis=0)
        else:
            send = np.where(active, vals, 0.0).astype(np.float64)
            edge_vals = send[src_idx]
            if comp.weighted or comp.edge_combine == "multiply":
                edge_vals = edge_vals * block["w_sorted"]
            reduced = np.add.reduceat(edge_vals, run_starts)
        if comp.message_precision == "float32":
            reduced = reduced.astype(np.float32)
    elif comp.reducer == "min":
        identity = _min_identity(comp)
        if vals.ndim == 2:  # vector messages (multi-source SSSP waves)
            # float64 only: inf + w == inf, so no identity guard is needed
            # on the additive edge combine.
            send = np.where(active[:, None], vals, identity).astype(np.float64)
            edge_vals = send[src_idx]
            if comp.edge_combine == "add":
                edge_vals = edge_vals + block["w_sorted"][:, None]
            elif comp.edge_combine == "add_one":
                edge_vals = edge_vals + 1.0
            reduced = np.minimum.reduceat(edge_vals, run_starts, axis=0)
        else:
            if comp.message_dtype == "float64":
                send = np.where(active, vals, identity).astype(np.float64)
            else:
                send = np.where(active, vals, identity).astype(np.int64)
            edge_vals = send[src_idx]
            if comp.edge_combine == "add":
                edge_vals = np.where(edge_vals == identity, identity, edge_vals + block["w_sorted"])
            elif comp.edge_combine == "add_one":
                edge_vals = np.where(edge_vals == identity, identity, edge_vals + 1)
            reduced = np.minimum.reduceat(edge_vals, run_starts)
    elif comp.reducer == "or":
        if vals.ndim == 2:  # vector bitmask messages (HyperANF registers)
            send = np.where(active[:, None], vals, 0).astype(np.uint64)
            edge_vals = send[src_idx]
            reduced = np.bitwise_or.reduceat(edge_vals, run_starts, axis=0)
        else:
            send = np.where(active, vals, 0).astype(np.uint64)
            edge_vals = send[src_idx]
            reduced = np.bitwise_or.reduceat(edge_vals, run_starts)
    else:  # pragma: no cover
        raise ValueError(comp.reducer)
    # ONE payload object per scatter (dst ids, reduced values, per-dest-
    # partition offsets). Receivers slice their [q] range — zero-copy on a
    # node via plasma mmap. Returning P separate objects instead costs P^2
    # small plasma puts per superstep, which dominated wall time at bench
    # scale (measured ~4k objects/iter -> ~200 ms/iter of pure overhead).
    return [
        {"dst": uniq_dst, "val": reduced, "slices": part_slices, "bounds": bounds},
        n_msgs,
    ]


def _scatter_vote(comp, block, state, num_parts, bounds):
    labels, active = comp.message_values(state, block)
    deg = block["degrees"]
    perm = block["perm"]
    n_msgs = int(deg[active].sum())
    if n_msgs == 0 or len(block["indices"]) == 0:
        return [None, 0]
    edge_labels = labels.astype(np.int64)[block["src_idx"]]
    sorted_dst = block["dst_sorted"]
    if comp.weighted and len(block["w_sorted"]):
        edge_w = block["w_sorted"]
    else:
        edge_w = np.ones(len(edge_labels), dtype=np.float64)
    nw = comp.vote_node_weights(state, block)
    if nw is not None:
        edge_w = edge_w * np.asarray(nw, dtype=np.float64)[block["src_idx"]]
    # pre-combine per (dst, label): stable sort by label within the
    # already-destination-sorted layout
    order = np.lexsort((edge_labels, sorted_dst))
    d, l, w = sorted_dst[order], edge_labels[order], edge_w[order]
    new_run = np.empty(len(d), dtype=bool)
    new_run[0] = True
    np.logical_or(d[1:] != d[:-1], l[1:] != l[:-1], out=new_run[1:])
    starts = np.flatnonzero(new_run)
    d_u, l_u = d[starts], l[starts]
    w_u = np.add.reduceat(w, starts)
    slices = np.searchsorted(d_u, bounds)
    return [
        {"dst": d_u, "lab": l_u, "val": w_u, "slices": slices, "bounds": bounds},
        n_msgs,
    ]


def _scatter_queue(comp, block, state, num_parts, bounds):
    """No reduction: one message per live edge, destination-sorted."""
    vals, active = comp.message_values(state, block)
    if len(block["indices"]) == 0:
        return [None, 0]
    src_idx = block["src_idx"]
    dtype = np.float64 if comp.message_dtype == "float64" else np.int64
    edge_vals = np.asarray(vals, dtype=dtype)[src_idx]
    if comp.weighted or comp.edge_combine == "multiply":
        edge_vals = edge_vals * block["w_sorted"]
    elif comp.edge_combine == "add":
        edge_vals = edge_vals + block["w_sorted"]
    elif comp.edge_combine == "add_one":
        edge_vals = edge_vals + 1
    keep = np.asarray(active, dtype=bool)[src_idx]
    d = block["dst_sorted"][keep]
    v = edge_vals[keep]
    if len(d) == 0:
        return [None, 0]
    return [
        {"dst": d, "val": v, "slices": np.searchsorted(d, bounds),
         "bounds": bounds},
        int(len(d)),
    ]


@ray.remote
def _scatter(comp, block, state, num_parts, bounds):
    if comp.reducer == "vote":
        return _scatter_vote(comp, block, state, num_parts, bounds)
    if comp.reducer == "queue":
        return _scatter_queue(comp, block, state, num_parts, bounds)
    return _scatter_reduced(comp, block, state, num_parts, bounds)


@ray.remote
def _scatter_sliced(comp, block, state, num_parts, bounds):
    """Scatter with per-destination-partition payload objects.

    Returns ``num_parts + 1`` objects: one payload per destination
    partition (``None`` when empty) plus the message count. On a
    multi-node cluster each apply task then pulls ONLY its own slice from
    each source partition — O(P) small objects per scatter instead of a
    P× broadcast of the full payload (the flat mode's single object is
    zero-copy on one node but ships everywhere on many). Values are
    byte-identical to flat mode: the apply-side combine still walks
    source partitions in fixed order.
    """
    if comp.reducer == "vote":
        payload, n = _scatter_vote(comp, block, state, num_parts, bounds)
    elif comp.reducer == "queue":
        payload, n = _scatter_queue(comp, block, state, num_parts, bounds)
    else:
        payload, n = _scatter_reduced(comp, block, state, num_parts, bounds)
    if payload is None:
        return [None] * num_parts + [n]
    sl = payload["slices"]
    out = []
    for q in range(num_parts):
        s, e = int(sl[q]), int(sl[q + 1])
        if s == e:
            out.append(None)
            continue
        piece = {"dst": payload["dst"][s:e], "val": payload["val"][s:e],
                 "bounds": bounds, "slices": None}
        if "lab" in payload:
            piece["lab"] = payload["lab"][s:e]
        out.append(piece)
    out.append(n)
    return out


@ray.remote
def _relay_merge(reducer: str, *payloads):
    """Merge a fixed group of scatter payloads into one (reduction tree).

    Cuts the per-superstep ref fan-in from P^2 (every apply reads every
    scatter) to P·(P/g): driver-side ref serialization was the measured
    superstep bottleneck at P=64. The merge is deterministic — payloads
    arrive in fixed partition order and the stable sort keeps equal
    destinations in that order, so reduceat combines floats identically
    at any parallelism.
    """
    real = [m for m in payloads if m is not None]
    if not real:
        return None
    if len(real) == 1:
        return real[0]
    bounds = real[0]["bounds"]
    dst = np.concatenate([m["dst"] for m in real])
    val = np.concatenate([m["val"] for m in real])
    if reducer == "vote":
        lab = np.concatenate([m["lab"] for m in real])
        order = np.lexsort((lab, dst))
        d, l, v = dst[order], lab[order], val[order]
        new_run = np.empty(len(d), dtype=bool)
        new_run[0] = True
        np.logical_or(d[1:] != d[:-1], l[1:] != l[:-1], out=new_run[1:])
        starts = np.flatnonzero(new_run)
        d_u, l_u, v_u = d[starts], l[starts], np.add.reduceat(v, starts)
        return {
            "dst": d_u, "lab": l_u, "val": v_u, "bounds": bounds,
            "slices": np.searchsorted(d_u, bounds),
        }
    if reducer == "queue":  # concatenation IS the merge; keep raw messages
        order = np.argsort(dst, kind="stable")
        d, v = dst[order], val[order]
        return {
            "dst": d, "val": v, "bounds": bounds,
            "slices": np.searchsorted(d, bounds),
        }
    order = np.argsort(dst, kind="stable")
    d, v = dst[order], val[order]
    new_run = np.empty(len(d), dtype=bool)
    new_run[0] = True
    new_run[1:] = d[1:] != d[:-1]
    starts = np.flatnonzero(new_run)
    d_u = d[starts]
    if reducer == "sum":
        v_u = np.add.reduceat(v, starts)
    elif reducer == "or":
        v_u = np.bitwise_or.reduceat(v, starts)
    else:
        v_u = np.minimum.reduceat(v, starts)
    return {
        "dst": d_u, "val": v_u, "bounds": bounds,
        "slices": np.searchsorted(d_u, bounds),
    }


@ray.remote
def _apply(comp, block, state, q, *inbox):
    """Combine partition-addressed messages (fixed order) and apply.

    ``inbox`` holds one payload per source partition; Ray resolves the
    refs before the task runs (zero-copy plasma reads on a node). The
    task slices its own [q] destination range out of each payload.
    """
    start, end = block["start"], block["end"]
    n_local = end - start
    state = {k: v.copy() for k, v in state.items()}

    def my_slice(msg):
        if msg["slices"] is None:  # pre-sliced payload: it is all ours
            return 0, len(msg["dst"])
        s, e = msg["slices"][q], msg["slices"][q + 1]
        return s, e

    if comp.reducer == "sum":
        width = comp.message_width
        for msg in inbox:
            if msg is not None and msg["val"].ndim == 2:
                width = msg["val"].shape[1]
                break
        shape = (n_local,) if width is None else (n_local, width)
        acc = np.zeros(shape, dtype=np.float64)
        received = np.zeros(n_local, dtype=bool)
        for msg in inbox:  # fixed partition order => deterministic float sums
            if msg is None:
                continue
            s, e = my_slice(msg)
            if s == e:
                continue
            idx = msg["dst"][s:e] - start
            acc[idx] += msg["val"][s:e]
            received[idx] = True
    elif comp.reducer == "or":
        width = comp.message_width
        for msg in inbox:
            if msg is not None and msg["val"].ndim == 2:
                width = msg["val"].shape[1]
                break
        shape = (n_local,) if width is None else (n_local, width)
        acc = np.zeros(shape, dtype=np.uint64)
        received = np.zeros(n_local, dtype=bool)
        for msg in inbox:
            if msg is None:
                continue
            s, e = my_slice(msg)
            if s == e:
                continue
            idx = msg["dst"][s:e] - start
            np.bitwise_or.at(acc, idx, msg["val"][s:e])
            received[idx] = True
    elif comp.reducer == "min":
        identity = _min_identity(comp)
        dtype = np.float64 if comp.message_dtype == "float64" else np.int64
        width = comp.message_width
        for msg in inbox:
            if msg is not None and msg["val"].ndim == 2:
                width = msg["val"].shape[1]
                break
        shape = (n_local,) if width is None else (n_local, width)
        acc = np.full(shape, identity, dtype=dtype)
        received = np.zeros(n_local, dtype=bool)
        for msg in inbox:
            if msg is None:
                continue
            s, e = my_slice(msg)
            if s == e:
                continue
            idx = msg["dst"][s:e] - start
            vals = msg["val"][s:e]
            np.minimum.at(acc, idx, vals)
            if width is None:
                received[idx] |= vals != identity
            else:
                received[idx] |= (vals != identity).any(axis=1)
    elif comp.reducer == "queue":
        ds, vs = [], []
        for msg in inbox:  # fixed source-partition order => deterministic
            if msg is None:
                continue
            s, e = my_slice(msg)
            if s == e:
                continue
            ds.append(msg["dst"][s:e])
            vs.append(msg["val"][s:e])
        if ds:
            d = np.concatenate(ds)
            v = np.concatenate(vs)
            order = np.argsort(d, kind="stable")
            d, v = d[order], v[order]
        else:
            d = np.zeros(0, dtype=np.int64)
            v = np.zeros(0, dtype=np.float64)
        received = np.zeros(n_local, dtype=bool)
        received[d - start] = True
        stats = comp.apply_queues(state, d - start, v, received, block)
        return state, stats
    else:  # vote: tally argmax(max weight, min label) per destination
        ds, ls, ws = [], [], []
        for msg in inbox:
            if msg is None:
                continue
            s, e = my_slice(msg)
            if s == e:
                continue
            ds.append(msg["dst"][s:e])
            ls.append(msg["lab"][s:e])
            ws.append(msg["val"][s:e])
        if ds:
            d = np.concatenate(ds)
            l = np.concatenate(ls)
            w = np.concatenate(ws)
            order = np.lexsort((l, d))  # deterministic merge order
            d, l, w = d[order], l[order], w[order]
            new_run = np.empty(len(d), dtype=bool)
            new_run[0] = True
            np.logical_or(d[1:] != d[:-1], l[1:] != l[:-1], out=new_run[1:])
            starts = np.flatnonzero(new_run)
            d_u, l_u = d[starts], l[starts]
            w_u = np.add.reduceat(w, starts)
            # winner per dst: max weight, ties -> min label. Sort by
            # (dst, -w, label) and take first row of each dst run.
            order2 = np.lexsort((l_u, -w_u, d_u))
            d2, l2 = d_u[order2], l_u[order2]
            first = np.empty(len(d2), dtype=bool)
            if len(d2):
                first[0] = True
                first[1:] = d2[1:] != d2[:-1]
            acc = np.full(n_local, -1, dtype=np.int64)
            received = np.zeros(n_local, dtype=bool)
            acc[d2[first] - start] = l2[first]
            received[d2[first] - start] = True
        else:
            acc = np.full(n_local, -1, dtype=np.int64)
            received = np.zeros(n_local, dtype=bool)
    async_local = (
        getattr(comp, "async_local", False)
        and comp.reducer in ("min", "or")
        and acc.ndim == 1
    )
    if async_local:
        v0 = np.asarray(comp.message_values(state, block)[0]).copy()
    stats = comp.apply_messages(state, acc, received, block)
    if async_local:
        # same-superstep delivery within the partition: relax local edges
        # (both endpoints in [start, end)) to a fixpoint before returning.
        # "or" (bitmask reachability/taint) is monotone like hash-min, so
        # the fixpoint is schedule-independent too; NOT valid for kernels
        # whose semantics read the superstep number (MSBFS depth waves).
        if comp.reducer == "or":
            identity = np.uint64(0)
            dtype = np.uint64
        else:
            identity = _min_identity(comp)
            dtype = np.float64 if comp.message_dtype == "float64" else np.int64
        dst_sorted = block["dst_sorted"]
        local = (dst_sorted >= start) & (dst_sorted < end)
        if local.any():
            l_src = block["src_idx"][local]
            l_dst = dst_sorted[local] - start  # still ascending (masked sort)
            l_w = (
                block["w_sorted"][local]
                if comp.edge_combine == "add"
                else None
            )
            l_runs = np.empty(len(l_dst), dtype=bool)
            l_runs[0] = True
            l_runs[1:] = l_dst[1:] != l_dst[:-1]
            l_starts = np.flatnonzero(l_runs)
            l_ud = l_dst[l_starts]
            for _round in range(n_local):  # monotone min/or => terminates
                vals, active = comp.message_values(state, block)
                if active is not None:
                    send = np.where(active, vals, identity).astype(dtype)
                else:
                    send = np.asarray(vals, dtype=dtype)
                ev = send[l_src]
                if comp.reducer == "or":
                    acc2 = np.full(n_local, identity, dtype=dtype)
                    acc2[l_ud] = np.bitwise_or.reduceat(ev, l_starts)
                else:
                    if comp.edge_combine == "add":
                        ev = np.where(ev == identity, identity, ev + l_w)
                    elif comp.edge_combine == "add_one":
                        ev = np.where(ev == identity, identity, ev + 1)
                    acc2 = np.full(n_local, identity, dtype=dtype)
                    acc2[l_ud] = np.minimum.reduceat(ev, l_starts)
                rec2 = acc2 != identity
                if not rec2.any():
                    break
                before = np.asarray(comp.message_values(state, block)[0])
                before = before.copy()
                st2 = comp.apply_messages(state, acc2, rec2, block)
                after = np.asarray(comp.message_values(state, block)[0])
                for k, v in st2.items():
                    if k.startswith("max_"):
                        stats[k] = max(stats.get(k, 0.0), v)
                    else:
                        stats[k] = stats.get(k, 0) + v
                if np.array_equal(before, after):
                    break
        vf = np.asarray(comp.message_values(state, block)[0])
        state[comp.active_state_key] = vf != v0
    return state, stats


@ray.remote
def _save_state(state: dict, path: str, partition: int, iteration: int) -> dict:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **state)
    os.replace(tmp, path)
    h = hashlib.blake2b(digest_size=16)
    for k in sorted(state):
        h.update(k.encode())
        h.update(np.ascontiguousarray(state[k]).tobytes())
    rows = len(next(iter(state.values()))) if state else 0
    return {"iteration": iteration, "partition": partition, "rows": rows, "digest": h.hexdigest()}


@ray.remote
def _load_state(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _agg_stats(per_part: list[dict]) -> dict:
    agg: dict = {}
    for s in per_part:
        for k, v in s.items():
            if k.startswith("max_"):
                agg[k] = max(agg.get(k, 0.0), v)
            else:
                agg[k] = agg.get(k, 0) + v
    return agg


class TerminationFlag:
    """External cancellation (reference termination/.../TerminationFlag.java).

    ``stop()`` flips the in-process flag and (when a path is given)
    touches a sentinel file so ANY process — another driver, an operator
    watching the job — can request a graceful stop; the BSP loop checks
    between supersteps and returns the last completed state.
    """

    def __init__(self, path: str | None = None):
        self.path = path
        self._stopped = False

    def stop(self) -> None:
        self._stopped = True
        if self.path:
            with open(self.path, "w") as f:
                f.write("stop")

    def running(self) -> bool:
        if self._stopped:
            return False
        if self.path and os.path.exists(self.path):
            return False
        return True


class Pregel:
    """BSP driver over a ``GraphStore``'s partitioned CSR blocks."""

    def __init__(self, graph, computation: PregelComputation, checkpoint_dir: str | None = None,
                 checkpoint_interval: int = 1, lookahead: int = 4,
                 reduce_fanin: int | None = None, scatter_mode: str = "auto",
                 termination_flag: TerminationFlag | None = None):
        self.graph = graph
        self.comp = computation
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_interval = checkpoint_interval
        self.lookahead = lookahead
        self.reduce_fanin = reduce_fanin
        # "flat": one payload object per scatter, apply tasks slice their
        #   range — zero-copy plasma reads on ONE node, but a P× payload
        #   broadcast across a real cluster.
        # "sliced": num_returns=P per-destination objects — each apply
        #   pulls exactly its own slices over the network (the multi-node
        #   mode). Outputs are byte-identical between modes (same values,
        #   same fixed-order combine).
        # "auto": sliced when the Ray cluster has >1 alive node.
        if scatter_mode == "auto":
            try:
                alive = sum(1 for n in ray.nodes() if n.get("Alive", n.get("alive", True)))
            except Exception:
                alive = 1
            scatter_mode = "sliced" if alive > 1 else "flat"
        self.scatter_mode = scatter_mode
        self.termination_flag = termination_flag
        self.history: list[dict] = []

    # checkpoint layout: {dir}/iter-{k}/part-{p}.npz + manifest-iter-{k}.json
    def _ckpt_path(self, it: int, p: int) -> str:
        return os.path.join(self.checkpoint_dir, f"iter-{it}", f"part-{p}.npz")

    def _latest_complete_iteration(self) -> int | None:
        if not self.checkpoint_dir or not os.path.isdir(self.checkpoint_dir):
            return None
        its = []
        for f in os.listdir(self.checkpoint_dir):
            if f.startswith("manifest-iter-") and f.endswith(".json"):
                its.append(int(f[len("manifest-iter-") : -len(".json")]))
        return max(its) if its else None

    def _checkpoint(self, it: int, state_refs: list, stats: dict) -> None:
        lineage = ray.get(
            [
                _save_state.remote(state_refs[p], self._ckpt_path(it, p), p, it)
                for p in range(len(state_refs))
            ]
        )
        safe_stats = {
            k: (v.tolist() if isinstance(v, np.ndarray) else v) for k, v in stats.items()
        }
        atomic_write_json(
            os.path.join(self.checkpoint_dir, f"manifest-iter-{it}.json"),
            {"iteration": it, "stats": safe_stats, "partitions": lineage},
        )
        with open(os.path.join(self.checkpoint_dir, "metrics.jsonl"), "a") as f:
            row = {
                k: (v.tolist() if isinstance(v, np.ndarray)
                    else float(v) if isinstance(v, np.floating) else v)
                for k, v in stats.items()
            }
            f.write(json.dumps({"iteration": it, **row}) + "\n")

    def run(self, max_iterations: int = 20, resume: bool = True) -> list:
        """Run supersteps; return final per-partition state refs.

        Superstep 0 initializes state (and, like the reference's initial
        superstep, its messages are produced by the first scatter).
        ``max_iterations`` bounds the TOTAL superstep count including
        superstep 0 (reference Pregel.java:178-216 loop semantics).
        """
        blocks = self.graph.block_refs()
        P = len(blocks)
        bounds_ref = ray.put(self.graph.boundaries)
        comp_ref = ray.put(self.comp)

        start_iter = 0
        state_refs = None
        if resume and self.checkpoint_dir:
            latest = self._latest_complete_iteration()
            if latest is not None:
                m = read_json(os.path.join(self.checkpoint_dir, f"manifest-iter-{latest}.json"))
                if self.comp.is_converged(m["stats"]) or latest + 1 >= max_iterations:
                    self.history.append(m["stats"])
                    return [_load_state.remote(self._ckpt_path(latest, p)) for p in range(P)]
                state_refs = [_load_state.remote(self._ckpt_path(latest, p)) for p in range(P)]
                start_iter = latest + 1

        if state_refs is None:
            state_refs = [_init_state.remote(comp_ref, blocks[p]) for p in range(P)]
            start_iter = 1
            if self.checkpoint_dir:
                self._checkpoint(0, state_refs, {"init": 1, "changed": 1})

        # Pipelined BSP: submit up to ``lookahead`` supersteps ahead as a
        # pure task DAG (state refs flow scatter -> apply -> next scatter)
        # and check convergence with a lag. Driver-side submission overhead
        # then overlaps with cluster compute instead of serializing the
        # supersteps; a converged run wastes at most ``lookahead`` no-op
        # iterations (their states are identical once converged).
        lookahead = max(1, int(self.lookahead))
        pending: dict[int, tuple] = {}
        states_by_iter: dict[int, list] = {start_iter - 1: state_refs}
        next_submit = start_iter
        final_refs = state_refs
        t_prev = time.perf_counter()
        for it in range(start_iter, max_iterations):
            if self.termination_flag is not None and not self.termination_flag.running():
                # graceful external stop: return last completed superstep's
                # state (checkpointed iff the interval already persisted it)
                break
            while next_submit < max_iterations and next_submit < it + lookahead:
                prev = states_by_iter[next_submit - 1]
                if self.scatter_mode == "sliced":
                    scatter_out = [
                        _scatter_sliced.options(num_returns=P + 1).remote(
                            comp_ref, blocks[p], prev[p], P, bounds_ref
                        )
                        for p in range(P)
                    ]
                    new_refs, stat_refs = [], []
                    for q in range(P):
                        inbox = [scatter_out[p][q] for p in range(P)]
                        out = _apply.options(num_returns=2).remote(
                            comp_ref, blocks[q], prev[q], q, *inbox
                        )
                        new_refs.append(out[0])
                        stat_refs.append(out[1])
                    msg_refs = [scatter_out[p][P] for p in range(P)]
                    pending[next_submit] = (new_refs, stat_refs, msg_refs)
                    states_by_iter[next_submit] = new_refs
                    next_submit += 1
                    continue
                scatter_out = [
                    _scatter.options(num_returns=2).remote(
                        comp_ref, blocks[p], prev[p], P, bounds_ref
                    )
                    for p in range(P)
                ]
                payloads = [scatter_out[p][0] for p in range(P)]
                if self.reduce_fanin and P > self.reduce_fanin:
                    g = int(self.reduce_fanin)
                    payloads = [
                        _relay_merge.remote(self.comp.reducer, *payloads[i : i + g])
                        for i in range(0, P, g)
                    ]
                new_refs, stat_refs = [], []
                for q in range(P):
                    out = _apply.options(num_returns=2).remote(
                        comp_ref, blocks[q], prev[q], q, *payloads
                    )
                    new_refs.append(out[0])
                    stat_refs.append(out[1])
                msg_refs = [scatter_out[p][1] for p in range(P)]
                pending[next_submit] = (new_refs, stat_refs, msg_refs)
                states_by_iter[next_submit] = new_refs
                next_submit += 1

            new_refs, stat_refs, msg_refs = pending.pop(it)
            stats = _agg_stats(ray.get(stat_refs))
            stats["messages"] = int(sum(ray.get(msg_refs)))
            now = time.perf_counter()
            stats["seconds"] = now - t_prev
            t_prev = now
            stats["iteration"] = it
            final_refs = new_refs
            self.history.append(stats)
            states_by_iter.pop(it - 1, None)
            # evaluate BOTH: master_compute is contractually called after
            # EVERY superstep (including the converging one) — `or` would
            # short-circuit it away on the final superstep
            conv = self.comp.is_converged(stats)
            mc = self.comp.master_compute(stats, it)
            halt = conv or mc
            if self.checkpoint_dir and (
                it % self.checkpoint_interval == 0 or halt
            ):
                self._checkpoint(it, new_refs, stats)
            if halt:
                break
        return final_refs

    def step(self, state_refs: list) -> tuple[list, dict]:
        """Run ONE scatter+apply round; return (new_state_refs, stats).

        Low-level building block for algorithms that alternate graphs or
        interleave extra work between supersteps (e.g. HITS hubs/auths,
        per-phase normalization).
        """
        blocks = self.graph.block_refs()
        P = len(blocks)
        bounds_ref = ray.put(self.graph.boundaries)
        comp_ref = ray.put(self.comp)
        if self.scatter_mode == "sliced":
            scatter_out = [
                _scatter_sliced.options(num_returns=P + 1).remote(
                    comp_ref, blocks[p], state_refs[p], P, bounds_ref
                )
                for p in range(P)
            ]
            new_refs, stat_refs = [], []
            for q in range(P):
                inbox = [scatter_out[p][q] for p in range(P)]
                out = _apply.options(num_returns=2).remote(
                    comp_ref, blocks[q], state_refs[q], q, *inbox
                )
                new_refs.append(out[0])
                stat_refs.append(out[1])
            stats = _agg_stats(ray.get(stat_refs))
            stats["messages"] = int(sum(ray.get([scatter_out[p][P] for p in range(P)])))
            return new_refs, stats
        scatter_out = [
            _scatter.options(num_returns=2).remote(
                comp_ref, blocks[p], state_refs[p], P, bounds_ref
            )
            for p in range(P)
        ]
        payloads = [scatter_out[p][0] for p in range(P)]
        new_refs, stat_refs = [], []
        for q in range(P):
            out = _apply.options(num_returns=2).remote(
                comp_ref, blocks[q], state_refs[q], q, *payloads
            )
            new_refs.append(out[0])
            stat_refs.append(out[1])
        stats = _agg_stats(ray.get(stat_refs))
        stats["messages"] = int(sum(ray.get([scatter_out[p][1] for p in range(P)])))
        return new_refs, stats

    def init_states(self) -> list:
        blocks = self.graph.block_refs()
        comp_ref = ray.put(self.comp)
        return [_init_state.remote(comp_ref, b) for b in blocks]

    def gather(self, state_refs: list, key: str) -> np.ndarray:
        """Dense node-indexed array of one state slot across partitions."""
        states = ray.get(state_refs)
        out = None
        for p, s in enumerate(states):
            arr = s[key]
            if out is None:
                out = np.zeros(self.graph.node_count, dtype=arr.dtype)
            out[self.graph.boundaries[p] : self.graph.boundaries[p + 1]] = arr
        return out

    def gather_ds(self, state_refs: list, key: str, out_col: str | None = None):
        """Dataset of ``(node, <out_col>)`` rows built per partition IN THE
        OBJECT STORE — the O(V) result never concatenates on the driver
        (the 10^10-node result contract; the driver touches only P refs).
        ``node`` is the dense id; key-space decoding composes as a
        map_batches against the idmap table when needed."""
        import pyarrow as _pa
        import ray.data as _rd

        col = out_col or key

        @ray.remote
        def _to_block(state: dict, start: int, end: int) -> _pa.Table:
            arr = np.asarray(state[key])
            return _pa.table(
                {
                    "node": _pa.array(np.arange(start, end, dtype=np.int64)),
                    col: _pa.array(arr),
                }
            )

        refs = [
            _to_block.remote(
                state_refs[p],
                int(self.graph.boundaries[p]),
                int(self.graph.boundaries[p + 1]),
            )
            for p in range(len(state_refs))
        ]
        return _rd.from_arrow_refs(refs)
