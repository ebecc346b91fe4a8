"""Collective-communication inventory of a compiled (SPMD-partitioned) HLO
module (VERDICT r3 item 2: ground the multi-chip step's communication term
in what the compiler actually emits, instead of a hand-assumed flat
"+N ms at 100 GB/s").

Given `jit(f).lower(...).compile().as_text()`, this parses every collective
instruction (all-to-all / all-gather / all-reduce / reduce-scatter /
collective-permute, sync or async-start form), sizes it from its result
shape, reads its replica group size, and multiplies by how many times the
instruction executes per call of the entry computation — following the call
graph through `call`/`fusion`/`conditional` (x1) and `while` bodies
(x trip count, recovered from the loop condition's `compare(counter,
constant)` bound; scan/fori lowerings all take this form).

The wire-time model (`collective_seconds`) is the scaling-book ring model
(jax-ml.github.io/scaling-book, "Sharded Matrices" / all-to-all section)
with every collective normalized to an equivalent wire-byte count so that
    T = wire_bytes / (2 * W_link_dir)
on a bidirectional ring of per-direction per-link bandwidth W:
    all-gather(full B)    wire = B * (g-1)/g      (pipelined bidi ring)
    reduce-scatter(in B)  wire = B * (g-1)/g
    all-reduce(B)         wire = 2B * (g-1)/g     (RS + AG)
    all-to-all(local B)   wire = B * g / 4        (ring a2a: T = B*g/(8W))
    collective-permute(B) wire = 2B               (single hop, one direction)
Reference for the traffic being modeled: the torch stack's explicit
all_to_all_4D per attention (diffusers_lite/utils/communication.py:40-160)
and the feature all_gather (wan/modules/model.py:663-667) — here the same
collectives are GSPMD-inserted and read back out of the compiled module.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

DTYPE_BYTES = {
    "pred": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
    "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1, "s32": 4, "u32": 4,
    "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16,
}

COLLECTIVE_OPS = (
    "all-to-all", "all-gather", "all-reduce", "reduce-scatter",
    "collective-permute",
)

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COMP_RE = re.compile(r"^(ENTRY\s+)?%?([\w\.\-]+)\s*(?:\(|\{)")
# Opcode of an instruction line: the first lowercase word followed by `(`
# after the `=`. Matching the result-shape text instead is a trap: async
# start ops return TUPLES whose layout annotations nest parens
# (`(bf16[...]{2,0,1:T(8,128)(2,1)}, ..., u32[]{:S(2)})`) — a
# shape-anchored regex silently drops every collective-permute-start /
# all-to-all-start in the module (this bug cost the first published audit
# all of its windowed-gather transport; tests pin the tuple forms now).
# Shape text cannot produce a false hit: dtypes never precede `(`, tile
# annotations are uppercase (`T(`, `S(`), and `(2,1)` follows `)`.
_OPCODE_RE = re.compile(r"\s([a-z][a-z0-9\-]*)\(")


def _op_and_shape(line: str) -> Tuple[str, str]:
    """(opcode, result-shape text) of one instruction line, or ("", "")."""
    eq = line.find(" = ")
    if eq < 0:
        return "", ""
    rhs = line[eq + 2:]
    m = _OPCODE_RE.search(rhs)
    if not m:
        return "", ""
    return m.group(1), rhs[:m.start()]
_CALLEE_RE = re.compile(
    r"(?:to_apply|calls|body|condition)=%?([\w\.\-]+)")
_BRANCH_RE = re.compile(r"branch_computations=\{([^}]*)\}")
_TRUEFALSE_RE = re.compile(
    r"(?:true_computation|false_computation)=%?([\w\.\-]+)")


def parse_replica_groups(line: str) -> Optional[List[List[int]]]:
    """Replica groups of one instruction line; handles the literal format
    `replica_groups={{0,1},{2,3}}` and the iota v2 format
    `replica_groups=[2,4]<=[8]` / `...<=[4,2]T(1,0)`."""
    m = re.search(r"replica_groups=\{(\{[^=]*?\})\}", line)
    if m:
        return [[int(v) for v in g.split(",") if v.strip()]
                for g in re.findall(r"\{([\d,\s]+)\}", m.group(1))]
    m = re.search(
        r"replica_groups=\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?",
        line)
    if m:
        ng, gs = int(m.group(1)), int(m.group(2))
        dims = [int(v) for v in m.group(3).split(",")]
        ids = np.arange(int(np.prod(dims))).reshape(dims)
        if m.group(4):
            ids = ids.transpose([int(v) for v in m.group(4).split(",")])
        return ids.reshape(ng, gs).tolist()
    return None


def _shape_bytes(text: str) -> List[int]:
    """Byte sizes of every dtype[dims] group in `text` (layout annotations
    `{...}` are ignored by construction of the regex)."""
    out = []
    for dt, dims in _SHAPE_RE.findall(text):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append(n * DTYPE_BYTES[dt])
    return out


@dataclasses.dataclass
class Collective:
    op: str                  # base opcode (async -start normalized away)
    bytes: int               # per-device result-buffer bytes (largest elem)
    group_size: int
    count: float             # executions per entry-computation call
    is_async: bool           # emitted as start/done pair (overlappable)
    computation: str
    replica_groups: Optional[List[List[int]]] = None
    channel_id: Optional[int] = None
    chained: bool = False     # carries async_collective_fusion_config flags

    def wire_bytes(self) -> float:
        g = max(self.group_size, 1)
        if g == 1:
            return 0.0
        if self.op == "all-gather":
            return self.bytes * (g - 1) / g
        if self.op == "reduce-scatter":
            return self.bytes * (g - 1) / g
        if self.op == "all-reduce":
            return 2.0 * self.bytes * (g - 1) / g
        if self.op == "all-to-all":
            return self.bytes * g / 4.0
        if self.op == "collective-permute":
            return 2.0 * self.bytes
        raise ValueError(self.op)


def _split_computations(hlo: str) -> Dict[str, List[str]]:
    comps: Dict[str, List[str]] = {}
    cur = None
    for line in hlo.splitlines():
        if not line.startswith(" ") and ("{" in line) and ("->" in line
                                                           or "ENTRY" in line):
            m = _COMP_RE.match(line.strip())
            if m:
                cur = m.group(2)
                comps[cur] = []
                if m.group(1):
                    comps.setdefault("__entry__", []).append(cur)
                continue
        if cur is not None and line.strip() == "}":
            cur = None
            continue
        if cur is not None:
            comps[cur].append(line)
    return comps


def _trip_count(cond_lines: List[str],
                comps: Optional[Dict[str, List[str]]] = None) -> Optional[int]:
    """Loop bound from a while condition: compare(counter, constant) with
    direction LT (trip = bound) or LE (bound + 1). XLA usually wraps the
    compare in a kLoop fusion (`ROOT ... fusion(%gte, %const),
    calls=%wrapped_compare_computation`), so the direction is searched one
    level into called computations; if no compare is found but the
    condition holds exactly one integer constant, that constant is the
    bound (the lax.scan/fori lowering: counter from 0, direction LT)."""
    consts = {}
    for line in cond_lines:
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=.*?constant\((\d+)\)",
                     line)
        if m:
            consts[m.group(1)] = int(m.group(2))

    search = list(cond_lines)
    if comps:
        for line in cond_lines:
            for callee in re.findall(r"calls=%?([\w\.\-]+)", line):
                search.extend(comps.get(callee, ()))

    direction = None
    for line in search:
        m = re.search(r"compare\(([^)]*)\).*direction=(LT|LE|GT|GE)", line)
        if not m:
            continue
        direction = m.group(2)
        ops = re.findall(r"%([\w\.\-]+)", m.group(1)) or [
            o.strip() for o in m.group(1).split(",")]
        vals = [consts[o] for o in ops if o in consts]
        if vals:
            bound = max(vals)
            return bound + 1 if direction in ("LE", "GE") else bound
    if len(set(consts.values())) == 1:
        bound = next(iter(consts.values()))
        return bound + 1 if direction in ("LE", "GE") else bound
    return None


def collect(hlo: str) -> Tuple[List[Collective], List[str]]:
    """All collectives in the module with per-entry-call execution counts.

    Returns (collectives, warnings). Conditional branches count as
    always-taken (an upper bound per iteration — the refl rollout's
    cond-skipped model call is accounted by the caller's composition, not
    here). While bodies whose trip count cannot be recovered count x1 and
    produce a warning."""
    comps = _split_computations(hlo)
    entries = comps.pop("__entry__", None)
    warnings: List[str] = []
    if not entries:
        warnings.append("no ENTRY computation found")
        return [], warnings
    entry = entries[-1]

    # call edges: computation -> [(multiplier, callee)].
    # Async collectives lower to an `async_collective_fusion` computation
    # referenced by a chain of async-start/async-update/async-done
    # instructions — only the START edge counts an execution (the others
    # would inflate counts ~4x), and computations reached via a start edge
    # are overlappable.
    edges: Dict[str, List[Tuple[float, str]]] = {}
    async_called: set = set()
    for name, lines in comps.items():
        out = []
        for line in lines:
            op, _ = _op_and_shape(line)
            if op == "while":
                body = re.search(r"body=%?([\w\.\-]+)", line)
                cond = re.search(r"condition=%?([\w\.\-]+)", line)
                trip = None
                if cond and cond.group(1) in comps:
                    trip = _trip_count(comps[cond.group(1)], comps)
                if trip is None:
                    warnings.append(
                        f"while in {name}: trip count unrecovered, using 1")
                    trip = 1
                # GSPMD collective matmul: a `windowed_dot_general_body_*`
                # while runs the gather/scatter in ring-permute chunk steps
                # pipelined under partial matmuls. The body's permutes are
                # synthesized into ONE full-buffer collective per loop
                # invocation (see the collection loop), so the body itself
                # counts x1 per invocation and is overlapped by
                # construction.
                if body and "windowed_dot_general_body" in body.group(1):
                    trip = 1
                    async_called.add(body.group(1))
                if body:
                    out.append((float(trip), body.group(1)))
                if cond:
                    out.append((float(trip), cond.group(1)))
            else:
                is_async_ref = bool(re.search(r"\sasync-(start|update|done)\(",
                                              line)) or op.endswith("-done")
                if re.search(r"\sasync-(update|done)\(", line) or \
                        op.endswith("-done"):
                    continue  # non-executing references to the async chain
                for callee in _CALLEE_RE.findall(line):
                    out.append((1.0, callee))
                    if is_async_ref:
                        async_called.add(callee)
                bm = _BRANCH_RE.search(line)
                if bm:
                    for b in bm.group(1).split(","):
                        out.append((1.0, b.strip().lstrip("%")))
                for b in _TRUEFALSE_RE.findall(line):
                    out.append((1.0, b))
        edges[name] = out

    # overlappable-by-construction propagates to everything reachable from
    # an async-start target or a windowed-dot-general body (the collective
    # instruction usually sits in a fusion called from there)
    frontier = list(async_called)
    while frontier:
        cur = frontier.pop()
        for _, callee in edges.get(cur, ()):
            if callee in comps and callee not in async_called:
                async_called.add(callee)
                frontier.append(callee)

    # multiplier per computation, propagated from the entry (call graphs of
    # HLO modules are DAGs; iterate in topological order via memoized DFS)
    mult: Dict[str, float] = {entry: 1.0}
    order = [entry]
    seen = {entry}
    i = 0
    while i < len(order):
        cur = order[i]
        i += 1
        for m, callee in edges.get(cur, ()):
            if callee not in comps:
                continue
            mult[callee] = mult.get(callee, 0.0) + mult[cur] * m
            if callee not in seen:
                seen.add(callee)
                order.append(callee)

    # `mult` accumulation above adds contributions as nodes are first
    # reached, but a node reached later along a second path would miss
    # propagation — recompute by relaxation until stable (small graphs).
    for _ in range(64):
        changed = False
        new = {entry: 1.0}
        for cur in order:
            for m, callee in edges.get(cur, ()):
                if callee not in comps:
                    continue
                new[callee] = new.get(callee, 0.0) + new.get(cur, 0.0) * m
        if new != mult:
            mult = new
            changed = True
        if not changed:
            break

    cols: List[Collective] = []
    has_windowed = any("windowed_dot_general_body" in n for n in comps)
    dropped_transport = 0
    for name, lines in comps.items():
        cmult = mult.get(name, 0.0)
        if cmult == 0.0:
            continue
        in_windowed = "windowed_dot_general_body" in name
        synthesized = False
        for line in lines:
            op, shape_text = _op_and_shape(line)
            if not op or op.endswith("-done"):
                continue
            base = op[:-6] if op.endswith("-start") else op
            if base not in COLLECTIVE_OPS:
                continue
            sizes = _shape_bytes(shape_text)
            if not sizes:
                continue
            groups = parse_replica_groups(line)
            pairs = _permute_pairs(line)
            if base == "collective-permute":
                # Windowed collective matmul (GSPMD "collective matmul"):
                # the gather/scatter of a windowed_dot_general loop is
                # carried ENTIRELY by ring permutes of one weight shard —
                # 2 channels x 2 unrolled steps inside the body, plus one
                # pipeliner prologue copy in the caller (fingerprint:
                # op_name metadata ends in .../dot_general). The semantic
                # transport per loop execution is ONE full-buffer
                # all-gather (bytes = shard x ring size; the bidirectional
                # two-channel schedule matches the ring all-gather time
                # B*(g-1)/g / 2W exactly), so: synthesize that collective
                # once per body and drop the individual transport permutes
                # everywhere. Genuine permutes (shard_map ppermute from
                # ring attention, partitioner reshards) keep their own
                # accounting.
                if in_windowed:
                    if not synthesized and pairs:
                        g = _ring_size(pairs)
                        kind = ("reduce-scatter"
                                if "windowed_dot_general_body_rs" in name
                                else "all-gather")
                        cols.append(Collective(
                            op=kind, bytes=max(sizes) * g, group_size=g,
                            count=cmult, is_async=True, computation=name,
                            replica_groups=_pair_components(pairs)))
                        synthesized = True
                    continue
                if has_windowed and "dot_general" in _op_name(line):
                    dropped_transport += 1
                    continue
            gsize = len(groups[0]) if groups else 1
            if base == "collective-permute" and groups is None:
                gsize = _ring_size(pairs) if pairs else 1
            chan = re.search(r"channel_id=(\d+)", line)
            cols.append(Collective(
                op=base, bytes=max(sizes), group_size=gsize, count=cmult,
                # overlappable: explicit async start/done, reachable from a
                # windowed-dot-general body, or an async_collective_fusion
                # (XLA's collective matmul: the gather is software-pipelined
                # under partial matmuls inside the kOutput fusion itself)
                is_async=(op.endswith("-start") or name in async_called
                          or name.startswith("async_collective_fusion")),
                computation=name,
                replica_groups=groups or (_pair_components(pairs)
                                          if pairs else None),
                channel_id=int(chan.group(1)) if chan else None,
                chained='"flag_start"' in line))
    if dropped_transport:
        warnings.append(
            f"absorbed {dropped_transport} windowed-transport permute "
            "prologue copies into the synthesized windowed gathers")
    return _dedup_channels(cols), warnings


def _op_name(line: str) -> str:
    m = re.search(r'op_name="([^"]*)"', line)
    return m.group(1) if m else ""


def _permute_pairs(line: str) -> List[Tuple[int, int]]:
    m = re.search(r"source_target_pairs=\{(.*?)\}\}", line)
    if not m:
        return []
    return [(int(a), int(b)) for a, b in
            re.findall(r"\{(\d+),(\d+)\}", m.group(1) + "}")]


def _ring_size(pairs: List[Tuple[int, int]]) -> int:
    """Size of the largest ring (connected component) in the permute's
    source->target graph — disjoint rings (e.g. per-slice windowed gathers
    under hybrid sharding) must not be priced as one big group."""
    comp = _pair_components(pairs)
    return max((len(c) for c in comp), default=1)


def _pair_components(pairs: List[Tuple[int, int]]) -> List[List[int]]:
    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: Dict[int, List[int]] = {}
    for x in parent:
        groups.setdefault(find(x), []).append(x)
    return [sorted(v) for v in sorted(groups.values())]


def _dedup_channels(cols: List[Collective]) -> List[Collective]:
    """Merge phase copies of one logical collective (VERDICT r3 item 2
    accuracy fix, found auditing the 14B serving HLO: the TPU collective
    pipeliner splits a loop-sunk all-gather into prologue / body / epilogue
    copies — up to 18 per channel in the SFT step — that all carry the SAME
    channel_id and the FULL result shape, so a naive per-instruction count
    multiplies the traffic ~3-8x and mislabels it sync).

    Caveat (observed in the same HLOs): channel ids are NOT unique for
    shard_map manual collectives — the Ulysses body's three qkv all-to-alls
    and the out all-to-all ALL carry channel_id=1 inside one computation,
    and the SFT backward loop's a2as reuse channel 1 again. Those are
    distinct sequential collectives, not phase copies. The reliable
    fingerprint: pipeliner chain copies carry an
    `async_collective_fusion_config` flag block in their backend_config
    (`flag_start=-1` on the prologue copy, chained values on the rest);
    plain collectives carry none. So ONLY flagged copies merge — grouped
    by (channel, op, bytes, group_size), counts summed within each
    computation (wide-loop unroll copies), max across computations (= the
    body copy; prologue/epilogue absorbed). Merged copies are pipelined by
    construction, hence overlappable. Verified on the 14B fwd/sft/usp
    HLOs: no flagged channel spans more than one loop context, so the
    max-across rule never collapses fwd-loop with bwd-loop traffic."""
    by_chan: Dict[Tuple[int, str, int, int], List[Collective]] = {}
    out: List[Collective] = []
    for c in cols:
        if c.channel_id is None or not c.chained:
            out.append(c)
        else:
            key = (c.channel_id, c.op, c.bytes, c.group_size)
            by_chan.setdefault(key, []).append(c)
    for key, copies in sorted(by_chan.items()):
        per_comp: Dict[str, float] = {}
        for c in copies:
            per_comp[c.computation] = per_comp.get(c.computation, 0.0) \
                + c.count
        count = max(per_comp.values())
        best = max(copies, key=lambda c: (c.count, c.bytes))
        out.append(dataclasses.replace(best, count=count, is_async=True))
    return out


# --- wire-time model ---------------------------------------------------------

# per-direction per-link ICI bandwidth (GB/s): v5e 4x400 Gbps links (2D
# torus), v5p 6x800 Gbps links (3D torus) — public chip specs; the scaling
# book's W_ici. DCN is per-host, shared (v5e: ~25 GB/s/host guide number).
ICI_GBPS = {"v5e": 50.0, "v5p": 100.0, "v4": 50.0}


def group_axes_span(replica_groups: Optional[List[List[int]]],
                    topo_shape: Optional[Tuple[int, ...]]) -> int:
    """Number of physical torus axes a collective's replica groups span.

    HLO global device ids follow the AOT topology's row-major coordinate
    order, so unraveling each group member over `topo_shape` (e.g. (2, 4)
    for v5e:2x4) tells which torus axes the group's traffic can ride. A
    group confined to one axis has 1 usable ring; a group spanning k axes
    can load-balance a bandwidth-optimal collective over k rings at once
    (each chip owns 2 links per torus axis) — the scaling-book multi-axis
    refinement the single-axis model is conservative about. Returns the
    MINIMUM span over groups (the least-parallel group bounds the step).
    """
    if not replica_groups or not topo_shape:
        return 1
    n_topo = int(np.prod(topo_shape))
    if any(int(i) >= n_topo for g in replica_groups for i in g):
        # device ids beyond the assumed torus (e.g. a stage compiled on a
        # larger topology than the hard-coded shape): degrade to the
        # conservative single-axis model instead of crashing the audit
        return 1
    spans = []
    for g in replica_groups:
        if len(g) <= 1:
            continue
        coords = np.stack([np.unravel_index(int(i), topo_shape)
                           for i in g])
        varying = int(sum(1 for ax in range(len(topo_shape))
                          if len(set(coords[:, ax].tolist())) > 1))
        spans.append(max(varying, 1))
    return min(spans) if spans else 1


def collective_seconds(cols: List[Collective], link_gbps: float,
                       topo_shape: Optional[Tuple[int, ...]] = None) -> Dict:
    """Total per-step communication seconds under the ring model, plus a
    per-opcode breakdown: {op: {bytes, wire_bytes, seconds, count}}.

    topo_shape: optional physical torus dims (e.g. (2, 4) for v5e:2x4).
    When given, each collective's wire time divides by the number of torus
    axes its replica groups actually span (group_axes_span) — a group laid
    out across k axes rides k bidirectional rings concurrently. Without
    it, the single-axis model (1 ring) prices everything — conservative
    for multi-axis groups, and unable to distinguish uly8 (one 8-group on
    both v5e axes) from ring2 x uly4 (two single-axis groups): VERDICT r4
    next #6. collective-permute (ring kv rotation) always moves along ONE
    ring regardless of span — neighbors are fixed — so it never gets the
    multi-axis discount."""
    per_op: Dict[str, Dict[str, float]] = {}
    total_s = 0.0
    overlappable_s = 0.0
    degraded = False
    n_topo = int(np.prod(topo_shape)) if topo_shape else 0
    for c in cols:
        w = c.wire_bytes() * c.count
        axes = 1
        if topo_shape and c.op != "collective-permute":
            axes = group_axes_span(c.replica_groups, topo_shape)
            if (axes == 1 and c.replica_groups
                    and any(int(i) >= n_topo
                            for g in c.replica_groups for i in g)):
                # ids beyond the assumed torus: group_axes_span degraded
                # to the single-axis model — surface it so the caller
                # does not label single-axis numbers "torus"
                degraded = True
        s = w / (2.0 * link_gbps * 1e9 * axes)
        d = per_op.setdefault(c.op, {"bytes": 0.0, "wire_bytes": 0.0,
                                     "seconds": 0.0, "count": 0.0})
        d["bytes"] += c.bytes * c.count
        d["wire_bytes"] += w
        d["seconds"] += s
        d["count"] += c.count
        total_s += s
        if c.is_async:
            overlappable_s += s
    out = {"per_op": per_op, "total_seconds": total_s,
           "async_overlappable_seconds": overlappable_s}
    if degraded:
        out["torus_fallback_single_axis"] = True
    return out


DCN_GBPS_PER_HOST = 25.0  # guide number: per-host DCN egress, GB/s


def domain_split(cols: List[Collective], slice_of: Dict[int, int],
                 ici_gbps: float,
                 dcn_gbps: float = DCN_GBPS_PER_HOST) -> Dict:
    """ICI vs DCN decomposition of a collective inventory for multi-slice
    pods (VERDICT r3 missing item 3: quantify what crossing the
    DCN-connected "data" axis costs per strategy, not just whether it
    happens — tests/test_fsdp_strategies.py proves the latter).

    `slice_of` maps HLO global device ids to slice indices (the mesh's
    "data" rows). A collective whose replica group spans s slices is
    priced hierarchically: an intra-slice phase over its g/s local members
    riding ICI (bidirectional-ring model, same formulas as wire_bytes) and
    a slice-level phase over s nodes riding DCN — per-device DCN wire:
        all-gather / reduce-scatter   B * (s-1)/s
        all-reduce                    2B * (s-1)/s
        all-to-all                    B * (s-1)/s   (the cross-slice rows)
    DCN seconds use the per-host single-direction bandwidth (conservative:
    DCN is shared per host, not per chip). Collectives confined to one
    slice are pure ICI."""
    ici_s = 0.0
    dcn_s = 0.0
    dcn_wire = 0.0
    cross_sites = []
    per_op_dcn: Dict[str, float] = {}
    for c in cols:
        if not c.replica_groups:
            # permutes without recoverable groups (collect() derives them
            # from source_target_pairs components when present)
            ici_s += c.wire_bytes() * c.count / (2.0 * ici_gbps * 1e9)
            continue
        spans = max(len({slice_of[i] for i in g}) for g in c.replica_groups)
        if spans <= 1:
            ici_s += c.wire_bytes() * c.count / (2.0 * ici_gbps * 1e9)
            continue
        g = max(c.group_size, 1)
        g_local = max(g // spans, 1)
        frac = (spans - 1) / spans
        if c.op in ("all-gather", "reduce-scatter"):
            w_dcn = c.bytes * frac
            w_ici = (c.bytes / spans) * (g_local - 1) / g_local
        elif c.op == "all-reduce":
            w_dcn = 2.0 * c.bytes * frac
            w_ici = 2.0 * (c.bytes / spans) * (g_local - 1) / g_local
        elif c.op == "all-to-all":
            w_dcn = c.bytes * frac
            w_ici = (c.bytes / spans) * g_local / 4.0
        else:  # collective-permute with explicit groups: one hop
            w_dcn = 2.0 * c.bytes
            w_ici = 0.0
        dcn_wire += w_dcn * c.count
        dcn_s += w_dcn * c.count / (dcn_gbps * 1e9)
        ici_s += w_ici * c.count / (2.0 * ici_gbps * 1e9)
        per_op_dcn[c.op] = per_op_dcn.get(c.op, 0.0) + w_dcn * c.count
        cross_sites.append({
            "op": c.op, "buffer_bytes": c.bytes, "group_size": g,
            "slices_spanned": spans, "count": c.count,
            "dcn_wire_bytes": round(w_dcn * c.count),
            "computation": c.computation})
    cross_sites.sort(key=lambda d: -d["dcn_wire_bytes"])
    return {
        "ici_seconds": round(ici_s, 6),
        "dcn_seconds": round(dcn_s, 6),
        "dcn_wire_bytes": round(dcn_wire),
        "dcn_gbps_per_host": dcn_gbps,
        "per_op_dcn_wire_bytes": {k: round(v) for k, v in
                                  per_op_dcn.items()},
        "n_cross_slice_sites": len(cross_sites),
        "top_cross_slice_sites": cross_sites[:8],
    }


def top_sites(cols: List[Collective], link_gbps: float,
              n: int = 10) -> List[Dict]:
    """The n collective SITES dominating wire traffic (attribution: which
    tensors the step actually moves). Sites are merged by (op, buffer
    bytes, group size) — e.g. every layer's all-gather of the same-shape
    weight is one row — and reported with their share of the total."""
    merged: Dict[Tuple[str, int, int], Dict] = {}
    for c in cols:
        key = (c.op, c.bytes, c.group_size)
        d = merged.setdefault(key, {
            "op": c.op, "buffer_bytes": c.bytes, "group_size": c.group_size,
            "count": 0.0, "wire_bytes": 0.0, "async_wire": 0.0,
            "computations": set()})
        d["count"] += c.count
        w = c.wire_bytes() * c.count
        d["wire_bytes"] += w
        if c.is_async:
            d["async_wire"] += w
        d["computations"].add(c.computation)
    total_wire = sum(d["wire_bytes"] for d in merged.values()) or 1.0
    rows = sorted(merged.values(), key=lambda d: -d["wire_bytes"])[:n]
    out = []
    for d in rows:
        out.append({
            "op": d["op"], "buffer_bytes": int(d["buffer_bytes"]),
            "group_size": d["group_size"], "count": d["count"],
            "wire_bytes": round(d["wire_bytes"]),
            "seconds": round(d["wire_bytes"] / (2.0 * link_gbps * 1e9), 6),
            "share_pct": round(100.0 * d["wire_bytes"] / total_wire, 2),
            "overlapped_pct": round(
                100.0 * d["async_wire"] / max(d["wire_bytes"], 1.0), 1),
            "example_computation": sorted(d["computations"])[0],
        })
    return out
