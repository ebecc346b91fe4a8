"""utils/hlo_comm.py — the compiled-HLO collective inventory behind
COMM_AUDIT.json (scripts/audit_collectives.py). Two pins:

  1. synthetic HLO: while-loop trip counts multiply nested collectives,
     async -start forms count once, replica groups parse in both formats,
     and the ring wire-byte model matches the scaling-book formulas.
  2. real module: a jitted data-parallel mean-gradient step on the 8-device
     CPU mesh must inventory exactly its gradient all-reduce(s), sized from
     true shapes, and a scanned body's collective must be counted
     trip-count times.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hyvideo_prfl_tpu.parallel import sharding as shd
from hyvideo_prfl_tpu.utils import hlo_comm

SYNTH = """\
HloModule jit_f, entry_computation_layout={(f32[8,16]{1,0})->f32[8,16]{1,0}}

%loop_cond (p: (s32[], f32[8,16])) -> pred[] {
  %p = (s32[], f32[8,16]{1,0}) parameter(0)
  %i = s32[] get-tuple-element((s32[], f32[8,16]{1,0}) %p), index=0
  %bound = s32[] constant(5)
  ROOT %lt = pred[] compare(s32[] %i, s32[] %bound), direction=LT
}

%loop_body (p: (s32[], f32[8,16])) -> (s32[], f32[8,16]) {
  %p = (s32[], f32[8,16]{1,0}) parameter(0)
  %i = s32[] get-tuple-element((s32[], f32[8,16]{1,0}) %p), index=0
  %x = f32[8,16]{1,0} get-tuple-element((s32[], f32[8,16]{1,0}) %p), index=1
  %one = s32[] constant(1)
  %i2 = s32[] add(s32[] %i, s32[] %one)
  %a2a = f32[8,16]{1,0} all-to-all(f32[8,16]{1,0} %x), replica_groups={{0,1,2,3},{4,5,6,7}}, dimensions={0}
  ROOT %t = (s32[], f32[8,16]{1,0}) tuple(s32[] %i2, f32[8,16]{1,0} %a2a)
}

%add_f32 (a: f32[], b: f32[]) -> f32[] {
  %a = f32[] parameter(0)
  %b = f32[] parameter(1)
  ROOT %s = f32[] add(f32[] %a, f32[] %b)
}

ENTRY %main (arg: f32[8,16]) -> f32[8,16] {
  %arg = f32[8,16]{1,0} parameter(0)
  %init_i = s32[] constant(0)
  %init = (s32[], f32[8,16]{1,0}) tuple(s32[] %init_i, f32[8,16]{1,0} %arg)
  %w = (s32[], f32[8,16]{1,0}) while((s32[], f32[8,16]{1,0}) %init), condition=%loop_cond, body=%loop_body
  %xw = f32[8,16]{1,0} get-tuple-element((s32[], f32[8,16]{1,0}) %w), index=1
  %ar-start = f32[8,16]{1,0} all-reduce-start(f32[8,16]{1,0} %xw), replica_groups=[2,4]<=[8], to_apply=%add_f32
  ROOT %ar-done = f32[8,16]{1,0} all-reduce-done(f32[8,16]{1,0} %ar-start)
}
"""


def test_synthetic_inventory():
    cols, warnings = hlo_comm.collect(SYNTH)
    assert not warnings
    by_op = {c.op: c for c in cols}
    assert set(by_op) == {"all-to-all", "all-reduce"}

    a2a = by_op["all-to-all"]
    assert a2a.count == 5.0  # while trip count from compare(i, constant(5))
    assert a2a.bytes == 8 * 16 * 4
    assert a2a.group_size == 4
    assert not a2a.is_async
    # ring model: wire = B * g / 4
    assert a2a.wire_bytes() == a2a.bytes * 4 / 4

    ar = by_op["all-reduce"]
    assert ar.count == 1.0  # -start counted, -done ignored
    assert ar.is_async
    assert ar.group_size == 4  # iota [2,4]<=[8]
    assert ar.wire_bytes() == 2 * ar.bytes * 3 / 4

    model = hlo_comm.collective_seconds(cols, link_gbps=100.0)
    expect = (5 * a2a.wire_bytes() + ar.wire_bytes()) / (2 * 100e9)
    assert abs(model["total_seconds"] - expect) < 1e-12
    assert model["async_overlappable_seconds"] == pytest.approx(
        ar.wire_bytes() / (2 * 100e9))


SYNTH_PHASES = """\
HloModule jit_g, entry_computation_layout={(bf16[8,256]{1,0})->bf16[8,256]{1,0}}

%loop_cond (p: (s32[], bf16[8,256])) -> pred[] {
  %p = (s32[], bf16[8,256]{1,0}) parameter(0)
  %i = s32[] get-tuple-element((s32[], bf16[8,256]{1,0}) %p), index=0
  %bound = s32[] constant(40)
  ROOT %lt = pred[] compare(s32[] %i, s32[] %bound), direction=LT
}

%phase_a (q: bf16[8,256]) -> bf16[8,256] {
  %q = bf16[8,256]{1,0} parameter(0)
  ROOT %ag = bf16[8,256]{1,0} all-gather(bf16[8,256]{1,0} %q), channel_id=7, replica_groups={{0,1,2,3}}, dimensions={0}, backend_config={"async_collective_fusion_config":{"flag_start":"2","flag_end":"24"}}
}

%phase_b (q: bf16[8,256]) -> bf16[8,256] {
  %q = bf16[8,256]{1,0} parameter(0)
  ROOT %ag = bf16[8,256]{1,0} all-gather(bf16[8,256]{1,0} %q), channel_id=7, replica_groups={{0,1,2,3}}, dimensions={0}, backend_config={"async_collective_fusion_config":{"flag_start":"2","flag_end":"24"}}
}

%loop_body (p: (s32[], bf16[8,256])) -> (s32[], bf16[8,256]) {
  %p = (s32[], bf16[8,256]{1,0}) parameter(0)
  %i = s32[] get-tuple-element((s32[], bf16[8,256]{1,0}) %p), index=0
  %x = bf16[8,256]{1,0} get-tuple-element((s32[], bf16[8,256]{1,0}) %p), index=1
  %one = s32[] constant(1)
  %i2 = s32[] add(s32[] %i, s32[] %one)
  %xa = bf16[8,256]{1,0} fusion(bf16[8,256]{1,0} %x), kind=kOutput, calls=%phase_a
  %xb = bf16[8,256]{1,0} fusion(bf16[8,256]{1,0} %xa), kind=kOutput, calls=%phase_b
  ROOT %t = (s32[], bf16[8,256]{1,0}) tuple(s32[] %i2, bf16[8,256]{1,0} %xb)
}

ENTRY %main (arg: bf16[8,256]) -> bf16[8,256] {
  %arg = bf16[8,256]{1,0} parameter(0)
  %pro = bf16[8,256]{1,0} all-gather(bf16[8,256]{1,0} %arg), channel_id=7, replica_groups={{0,1,2,3}}, dimensions={0}, backend_config={"async_collective_fusion_config":{"flag_start":"-1","flag_end":"-1"}}
  %lone = bf16[8,256]{1,0} all-gather(bf16[8,256]{1,0} %pro), channel_id=9, replica_groups={{0,1,2,3}}, dimensions={0}
  %init_i = s32[] constant(0)
  %init = (s32[], bf16[8,256]{1,0}) tuple(s32[] %init_i, bf16[8,256]{1,0} %lone)
  %w = (s32[], bf16[8,256]{1,0}) while((s32[], bf16[8,256]{1,0}) %init), condition=%loop_cond, body=%loop_body
  ROOT %xw = bf16[8,256]{1,0} get-tuple-element((s32[], bf16[8,256]{1,0}) %w), index=1
}
"""


def test_channel_phase_copy_dedup():
    """The collective pipeliner's phase copies (same channel_id, full
    result shape, `async_collective_fusion_config` flags in the
    backend_config, spread across prologue/body computations — observed
    3-18 copies per channel in the real 14B HLOs) must merge to ONE
    logical collective with the body's executions-per-step, marked
    overlappable. Unflagged collectives must NOT merge even when they
    share a channel id (shard_map manual collectives reuse channel 1)."""
    cols, warnings = hlo_comm.collect(SYNTH_PHASES)
    assert not warnings
    ch7 = [c for c in cols if c.channel_id == 7]
    assert len(ch7) == 1, ch7
    # prologue x1 + phase_a x40 + phase_b x40 -> logical count = 40, NOT 81
    assert ch7[0].count == 40.0
    assert ch7[0].is_async  # pipelined by construction
    assert ch7[0].bytes == 8 * 256 * 2
    # an unflagged channel stays untouched (and keeps its sync marking)
    ch9 = [c for c in cols if c.channel_id == 9]
    assert len(ch9) == 1 and ch9[0].count == 1.0 and not ch9[0].is_async


def test_unflagged_channel_reuse_not_merged():
    """shard_map a2a channel reuse: two flag-less all-to-alls sharing
    channel_id=1 in one body are distinct sequential collectives — both
    must be counted, neither marked overlappable."""
    hlo = SYNTH.replace(
        "%a2a = f32[8,16]{1,0} all-to-all(f32[8,16]{1,0} %x), "
        "replica_groups={{0,1,2,3},{4,5,6,7}}, dimensions={0}",
        "%a2a0 = f32[8,16]{1,0} all-to-all(f32[8,16]{1,0} %x), "
        "channel_id=1, replica_groups={{0,1,2,3},{4,5,6,7}}, dimensions={0}\n"
        "  %a2a = f32[8,16]{1,0} all-to-all(f32[8,16]{1,0} %a2a0), "
        "channel_id=1, replica_groups={{0,1,2,3},{4,5,6,7}}, dimensions={0}")
    cols, warnings = hlo_comm.collect(hlo)
    assert not warnings
    a2a = [c for c in cols if c.op == "all-to-all"]
    assert len(a2a) == 2
    assert sum(c.count for c in a2a) == 10.0  # 2 per trip x 5 trips
    assert not any(c.is_async for c in a2a)


SYNTH_WINDOWED = """\
HloModule jit_h, entry_computation_layout={(bf16[128,64]{1,0})->bf16[128,64]{1,0}}

%wloop_cond (p: (s32[], bf16[128,64])) -> pred[] {
  %p = (s32[], bf16[128,64]{1,0}) parameter(0)
  %i = s32[] get-tuple-element((s32[], bf16[128,64]{1,0}) %p), index=0
  %bound = s32[] constant(2)
  ROOT %lt = pred[] compare(s32[] %i, s32[] %bound), direction=LT
}

%wide.windowed_dot_general_body_ag.sunk (p: (s32[], bf16[128,64])) -> (s32[], bf16[128,64]) {
  %p = (s32[], bf16[128,64]{1,0}) parameter(0)
  %i = s32[] get-tuple-element((s32[], bf16[128,64]{1,0}) %p), index=0
  %x = bf16[128,64]{1,0} get-tuple-element((s32[], bf16[128,64]{1,0}) %p), index=1
  %one = s32[] constant(1)
  %i2 = s32[] add(s32[] %i, s32[] %one)
  %cps0 = (bf16[128,64]{1,0:T(8,128)(2,1)}, bf16[128,64]{1,0:T(8,128)(2,1)}, u32[]{:S(2)}, u32[]{:S(2)}) collective-permute-start(bf16[128,64]{1,0} %x), channel_id=11, source_target_pairs={{0,7},{1,0},{2,1},{3,2},{4,3},{5,4},{6,5},{7,6}}, metadata={op_name="jit(h)/blocks/o/dot_general"}
  %cpd0 = bf16[128,64]{1,0} collective-permute-done((bf16[128,64]{1,0:T(8,128)(2,1)}, bf16[128,64]{1,0:T(8,128)(2,1)}, u32[]{:S(2)}, u32[]{:S(2)}) %cps0)
  %cps1 = (bf16[128,64]{1,0:T(8,128)(2,1)}, bf16[128,64]{1,0:T(8,128)(2,1)}, u32[]{:S(2)}, u32[]{:S(2)}) collective-permute-start(bf16[128,64]{1,0} %cpd0), channel_id=12, source_target_pairs={{0,1},{1,2},{2,3},{3,4},{4,5},{5,6},{6,7},{7,0}}, metadata={op_name="jit(h)/blocks/o/dot_general"}
  %cpd1 = bf16[128,64]{1,0} collective-permute-done((bf16[128,64]{1,0:T(8,128)(2,1)}, bf16[128,64]{1,0:T(8,128)(2,1)}, u32[]{:S(2)}, u32[]{:S(2)}) %cps1)
  ROOT %t = (s32[], bf16[128,64]{1,0}) tuple(s32[] %i2, bf16[128,64]{1,0} %cpd1)
}

ENTRY %main (arg: bf16[128,64]) -> bf16[128,64] {
  %arg = bf16[128,64]{1,0} parameter(0)
  %pro = (bf16[128,64]{1,0:T(8,128)(2,1)}, bf16[128,64]{1,0:T(8,128)(2,1)}, u32[]{:S(2)}, u32[]{:S(2)}) collective-permute-start(bf16[128,64]{1,0} %arg), channel_id=10, source_target_pairs={{0,7},{1,0},{2,1},{3,2},{4,3},{5,4},{6,5},{7,6}}, metadata={op_name="jit(h)/blocks/o/dot_general"}
  %prod = bf16[128,64]{1,0} collective-permute-done((bf16[128,64]{1,0:T(8,128)(2,1)}, bf16[128,64]{1,0:T(8,128)(2,1)}, u32[]{:S(2)}, u32[]{:S(2)}) %pro)
  %ring = (bf16[128,64]{1,0:T(8,128)(2,1)}, bf16[128,64]{1,0:T(8,128)(2,1)}, u32[]{:S(2)}, u32[]{:S(2)}) collective-permute-start(bf16[128,64]{1,0} %prod), channel_id=20, source_target_pairs={{0,4},{4,0},{1,5},{5,1},{2,6},{6,2},{3,7},{7,3}}, metadata={op_name="jit(h)/ring/ppermute"}
  %ringd = bf16[128,64]{1,0} collective-permute-done((bf16[128,64]{1,0:T(8,128)(2,1)}, bf16[128,64]{1,0:T(8,128)(2,1)}, u32[]{:S(2)}, u32[]{:S(2)}) %ring)
  %init_i = s32[] constant(0)
  %init = (s32[], bf16[128,64]{1,0}) tuple(s32[] %init_i, bf16[128,64]{1,0} %ringd)
  %w = (s32[], bf16[128,64]{1,0}) while((s32[], bf16[128,64]{1,0}) %init), condition=%wloop_cond, body=%wide.windowed_dot_general_body_ag.sunk
  ROOT %xw = bf16[128,64]{1,0} get-tuple-element((s32[], bf16[128,64]{1,0}) %w), index=1
}
"""


def test_windowed_transport_synthesis():
    """The GSPMD collective matmul carries its gather entirely as ring
    permutes of one weight shard inside a `windowed_dot_general_body`
    while (plus a pipeliner prologue copy in the caller, fingerprinted by
    the .../dot_general op_name). These are tuple-result async-start forms
    whose layout annotations (`T(8,128)(2,1)`, `u32[]{:S(2)}`) defeat a
    shape-anchored opcode regex — the original parser dropped ALL of them,
    costing the first published 14B fwd audit ~19.5 GiB of its 26.3 GiB
    physical weight-gather floor. Pin: the body synthesizes ONE full-buffer
    all-gather per loop invocation (bytes = shard x ring size, overlapped
    by construction), transport permutes and prologue copies are absorbed,
    and a genuine ppermute (ring attention) keeps its own accounting."""
    cols, warnings = hlo_comm.collect(SYNTH_WINDOWED)
    assert any("absorbed" in w for w in warnings), warnings
    by_op = {c.op: c for c in cols}
    assert set(by_op) == {"all-gather", "collective-permute"}

    shard = 128 * 64 * 2
    ag = by_op["all-gather"]
    assert ag.bytes == shard * 8  # full buffer = shard x ring size
    assert ag.group_size == 8
    assert ag.count == 1.0  # once per windowed-loop invocation, NOT x trips
    assert ag.is_async  # pipelined under partial matmuls by construction
    assert ag.replica_groups == [[0, 1, 2, 3, 4, 5, 6, 7]]

    ring = by_op["collective-permute"]
    assert ring.count == 1.0 and ring.bytes == shard
    assert ring.is_async  # start/done pair
    # disjoint pairwise exchange rings: group is the component size (2),
    # not the device count; replica groups decompose per component
    assert ring.group_size == 2
    assert ring.replica_groups == [[0, 4], [1, 5], [2, 6], [3, 7]]
    assert ring.wire_bytes() == 2 * shard


def test_windowed_rs_synthesis():
    """A `windowed_dot_general_body_rs` body synthesizes a reduce-scatter
    (the gradient-scatter side of the collective matmul in the backward)."""
    hlo = SYNTH_WINDOWED.replace("windowed_dot_general_body_ag",
                                 "windowed_dot_general_body_rs")
    cols, _ = hlo_comm.collect(hlo)
    rs = [c for c in cols if c.op == "reduce-scatter"]
    assert len(rs) == 1
    assert rs[0].bytes == 128 * 64 * 2 * 8
    assert rs[0].wire_bytes() == rs[0].bytes * 7 / 8


def test_async_tuple_start_forms_parse():
    """all-to-all-start with a nested-tuple result (the async-a2a libtpu
    flags emit `((operand), result, u32[], u32[])`) must be counted once,
    async, at the a2a buffer size."""
    hlo = SYNTH.replace(
        "%a2a = f32[8,16]{1,0} all-to-all(f32[8,16]{1,0} %x), "
        "replica_groups={{0,1,2,3},{4,5,6,7}}, dimensions={0}",
        "%a2as = ((f32[8,16]{1,0:T(8,128)}), f32[8,16]{1,0:T(8,128)}, "
        "u32[]{:S(2)}, u32[]{:S(2)}) all-to-all-start(f32[8,16]{1,0} %x), "
        "channel_id=3, replica_groups={{0,1,2,3},{4,5,6,7}}, dimensions={0}\n"
        "  %a2a = f32[8,16]{1,0} all-to-all-done(((f32[8,16]{1,0:T(8,128)}),"
        " f32[8,16]{1,0:T(8,128)}, u32[]{:S(2)}, u32[]{:S(2)}) %a2as)")
    cols, warnings = hlo_comm.collect(hlo)
    assert not warnings
    a2a = [c for c in cols if c.op == "all-to-all"]
    assert len(a2a) == 1
    assert a2a[0].count == 5.0 and a2a[0].is_async
    assert a2a[0].bytes == 8 * 16 * 4 and a2a[0].group_size == 4


def test_domain_split_ici_vs_dcn():
    """Multi-slice pricing (COMM_AUDIT `domains`): a collective confined
    to one slice is pure ICI; one spanning slices pays the hierarchical
    DCN term at the per-host single-direction bandwidth."""
    slice_of = {i: i // 4 for i in range(8)}  # 2 slices x 4 chips
    mk = hlo_comm.Collective
    intra = mk(op="all-gather", bytes=1 << 20, group_size=4, count=10.0,
               is_async=False, computation="c",
               replica_groups=[[0, 1, 2, 3], [4, 5, 6, 7]])
    cross = mk(op="all-gather", bytes=1 << 20, group_size=8, count=10.0,
               is_async=False, computation="c",
               replica_groups=[[0, 1, 2, 3, 4, 5, 6, 7]])
    ar = mk(op="all-reduce", bytes=1 << 20, group_size=8, count=2.0,
            is_async=False, computation="c",
            replica_groups=[[0, 1, 2, 3, 4, 5, 6, 7]])
    out = hlo_comm.domain_split([intra, cross, ar], slice_of,
                                ici_gbps=100.0, dcn_gbps=25.0)
    B = 1 << 20
    # intra: pure ICI ring AG over 4
    ici = B * 3 / 4 * 10 / (2 * 100e9)
    # cross AG: DCN B*(s-1)/s, ICI (B/s)*(gl-1)/gl
    dcn = B / 2 * 10 / 25e9
    ici += (B / 2) * 3 / 4 * 10 / (2 * 100e9)
    # cross AR: 2x both terms
    dcn += 2 * (B / 2) * 2 / 25e9
    ici += 2 * (B / 2) * 3 / 4 * 2 / (2 * 100e9)
    # domain_split rounds to 6 decimals
    assert out["dcn_seconds"] == pytest.approx(dcn, abs=1e-6)
    assert out["ici_seconds"] == pytest.approx(ici, abs=1e-6)
    assert out["n_cross_slice_sites"] == 2
    assert out["dcn_wire_bytes"] == pytest.approx(
        B / 2 * 10 + 2 * (B / 2) * 2)
    # all cross-slice traffic attributed per op
    assert set(out["per_op_dcn_wire_bytes"]) == {"all-gather", "all-reduce"}


def test_replica_group_formats():
    lit = hlo_comm.parse_replica_groups("replica_groups={{0,2},{1,3}}")
    assert lit == [[0, 2], [1, 3]]
    iota = hlo_comm.parse_replica_groups("replica_groups=[4,2]<=[2,4]T(1,0)")
    ids = np.arange(8).reshape(2, 4).transpose(1, 0).reshape(4, 2)
    assert iota == ids.tolist()
    assert hlo_comm.parse_replica_groups("no groups here") is None


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_real_module_inventory():
    mesh = shd.make_mesh(data=8, sp=1, devices=jax.devices()[:8])
    w = jnp.ones((64, 64))
    x_sh = NamedSharding(mesh, P("data", None))

    def loss(w, x):
        # scan so the per-iteration matmul's gradient all-reduce sits in a
        # while body: the inventory must multiply it by the trip count
        def body(h, _):
            return jnp.tanh(h @ w), None

        h, _ = jax.lax.scan(body, x, None, length=3)
        return jnp.mean(h ** 2)

    with jax.set_mesh(mesh):
        x = jax.device_put(jnp.ones((16, 64)), x_sh)
        compiled = jax.jit(jax.grad(loss)).lower(w, x).compile()
    cols, _ = hlo_comm.collect(compiled.as_text())
    ars = [c for c in cols if c.op == "all-reduce"]
    assert ars, "data-parallel gradient must all-reduce"
    # the dL/dw reduction is [64,64] f32 over all 8 devices
    big = [c for c in ars if c.bytes == 64 * 64 * 4]
    assert big and all(c.group_size == 8 for c in big)
    total = sum(c.count for c in big)
    # XLA emits it inside the backward scan body: the while trip count (3,
    # recovered through the kLoop-fusion-wrapped loop condition) must
    # multiply it. Hoisting after accumulation (count 1) would also be
    # sound, but current XLA keeps it in-body — pin the stronger claim so
    # a trip-count regression is loud.
    assert total == 3.0, total


def test_torus_pricing_breaks_uly8_vs_ring_tie():
    """Multi-axis torus pricing (VERDICT r4 next #6): under the single-axis
    ring model an 8-wide a2a moving 2x the wire of a 4-wide one prices
    IDENTICALLY to ring-kv permutes + 4-wide a2a — the documented 33.59 s
    six-decimal tie. With topo_shape, a group spanning k physical axes
    rides k rings: the v5e 2x4 8-group gets 2x bandwidth, single-axis
    groups and ring permutes (fixed neighbors) do not — so uly8 prices
    BELOW ring2 x uly4 and the model, not prose, breaks the tie."""
    mk = hlo_comm.Collective
    B = 1 << 24
    topo = (2, 4)
    # pure-Ulysses: one 8-wide a2a spanning BOTH v5e axes, wire B*8/4 = 2B
    uly8 = [mk(op="all-to-all", bytes=B, group_size=8, count=1.0,
               is_async=False, computation="c",
               replica_groups=[[0, 1, 2, 3, 4, 5, 6, 7]])]
    # ring2 x uly4: 4-wide a2a (one axis, wire B) + a ring-kv permute
    # moving B/2 both ways (wire 2 x B/2 = B) -> total 2B, tying uly8's
    # 2B under the single-axis model (the COMM_AUDIT 33.59 s structure)
    r2u4 = [mk(op="all-to-all", bytes=B, group_size=4, count=1.0,
               is_async=False, computation="c",
               replica_groups=[[0, 1, 2, 3], [4, 5, 6, 7]]),
            mk(op="collective-permute", bytes=B // 2, count=1.0,
               group_size=2, is_async=True, computation="c",
               replica_groups=[[0, 4], [1, 5], [2, 6], [3, 7]])]
    link = 50.0
    # single-axis model: uly8 wire 2B == r2u4 wire B + 2*2*(B/2) -> a tie
    s_uly8 = hlo_comm.collective_seconds(uly8, link)
    s_r2u4 = hlo_comm.collective_seconds(r2u4, link)
    assert s_uly8["total_seconds"] == pytest.approx(
        s_r2u4["total_seconds"], rel=1e-9)
    # torus model: the 8-group spans both axes -> 2 rings -> half the time;
    # the 4-group and the permutes span one axis each -> unchanged
    t_uly8 = hlo_comm.collective_seconds(uly8, link, topo)
    t_r2u4 = hlo_comm.collective_seconds(r2u4, link, topo)
    assert t_uly8["total_seconds"] == pytest.approx(
        s_uly8["total_seconds"] / 2, rel=1e-9)
    assert t_r2u4["total_seconds"] == pytest.approx(
        s_r2u4["total_seconds"], rel=1e-9)
    assert t_uly8["total_seconds"] < t_r2u4["total_seconds"]

    # span arithmetic on the v5p 3D torus: the full 8-group spans 3 axes,
    # a 2x2 face spans 2, a straight pair spans 1
    assert hlo_comm.group_axes_span([[0, 1, 2, 3, 4, 5, 6, 7]],
                                    (2, 2, 2)) == 3
    assert hlo_comm.group_axes_span([[0, 1, 2, 3]], (2, 2, 2)) == 2
    assert hlo_comm.group_axes_span([[0, 4]], (2, 2, 2)) == 1
    # mixed groups: the least-parallel group bounds the collective
    assert hlo_comm.group_axes_span([[0, 1, 2, 3], [4, 5]], (2, 4)) == 1
    assert hlo_comm.group_axes_span(None, (2, 4)) == 1


def test_comm_audit_14b_invariants():
    """Pins the published COMM_AUDIT.json invariants at the REAL 14B
    shapes (VERDICT r4 next #4/#6/#7):

    * zero '[SPMD] Involuntary full rematerialization' warnings in every
      chipless 14B AOT compile (the README's invariant, previously pinned
      only at dim-128 proxies by test_spmd_clean.py);
    * torus-aware pricing present, <= the single-axis model, and actually
      breaking the uly8 vs ring2-x-uly4 tie on real HLO inventories;
    * the async-schedule composed interval is coherent with (and no wider
      than) the sync one.
    """
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COMM_AUDIT.json")
    with open(path) as f:
        audit = json.load(f)
    stages = audit["stages"]

    core = ("fwd", "sft", "usp")
    for name in core:
        assert name in stages, f"stage {name} missing from COMM_AUDIT"
    for name, st in stages.items():
        assert st.get("spmd_involuntary_remat_warnings") == 0, (
            f"stage {name}: SPMD involuntary-remat warnings at 14B scale "
            f"(got {st.get('spmd_involuntary_remat_warnings')!r})")
        assert st.get("total_seconds_torus") is not None, (
            f"stage {name}: torus pricing missing")
        assert st["total_seconds_torus"] <= st["total_seconds"] + 1e-9

    # the torus model must break the serving-topology tie the single-axis
    # model could not (STATUS.md's 33.59 s six-decimal admission)
    if "usp_uly8" in stages:
        assert (stages["usp_uly8"]["total_seconds"]
                == pytest.approx(stages["usp"]["total_seconds"], rel=2e-3))
        assert (stages["usp_uly8"]["total_seconds_torus"]
                < 0.99 * stages["usp"]["total_seconds_torus"]), (
            "torus pricing did not separate uly8 from ring2 x uly4")

    itv = audit.get("composed_step_interval_s")
    assert itv and itv[0] <= itv[1]
    itv_a = audit.get("composed_step_interval_async_s")
    if itv_a is not None:
        assert itv_a[0] <= itv_a[1] <= itv[1] + 1e-6, (
            "async-schedule interval must be no wider than the sync one")
