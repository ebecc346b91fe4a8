"""Head-chunked Ulysses attention (HYV_ULYSSES_CHUNKS) — a2a/compute
overlap for the sequence-parallel sandwich.

Round-4 follow-up to the comm audit's finding that the shard_map Ulysses
all_to_alls are emitted synchronously (COMM_AUDIT.json; ~155 ms per 14B
fwd, 12.4 s of the 40-step USP serving chain): with
`--xla_tpu_enable_async_all_to_all` (parallel/sharding.
ASYNC_COLLECTIVE_FLAGS) XLA-TPU lowers the a2a as start/done pairs, and
splitting the sandwich over head groups lets chunk i's flash kernel run
inside chunk j's a2a window. Numerics are exactly the monolithic path
(heads are independent).

Reference parity anchor: the traffic being overlapped is the reference's
all_to_all_4D sandwich (communication.py:40-160).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hyvideo_prfl_tpu.ops.attention import ulysses_attention, ulysses_chunks
from hyvideo_prfl_tpu.ops.ring_attention import usp_attention
from hyvideo_prfl_tpu.parallel import sharding as shd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ulysses_chunks_clamping():
    # divisibility: every chunk's heads must still split over sp
    assert ulysses_chunks(40, 4) == 1  # default env: chunks=1
    os.environ["HYV_ULYSSES_CHUNKS"] = "5"
    try:
        assert ulysses_chunks(40, 4) == 5   # 40 % (4*5) == 0
        assert ulysses_chunks(20, 4) == 5   # 20 % 20 == 0
        assert ulysses_chunks(8, 4) == 2    # clamped to n_heads//sp
        assert ulysses_chunks(4, 4) == 1    # one head per device: mono
        os.environ["HYV_ULYSSES_CHUNKS"] = "2"
        assert ulysses_chunks(20, 4) == 1   # 20 % 8 != 0 -> degrade
    finally:
        del os.environ["HYV_ULYSSES_CHUNKS"]


@pytest.fixture()
def dsp_mesh(devices8):
    return shd.make_mesh(data=2, sp=4, devices=devices8)


def test_ulysses_chunked_matches_mono(dsp_mesh, monkeypatch):
    b, l, n, d = 2, 64, 8, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, l, n, d), jnp.float32) for kk in ks)

    def run():
        with jax.set_mesh(dsp_mesh):
            sh = NamedSharding(dsp_mesh, P("data", "sp", None, None))
            qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
            o, vjp = jax.vjp(
                lambda q, k, v: ulysses_attention(q, k, v), qs, ks_, vs)
            dq, dk, dv = vjp(jnp.ones_like(o))
        return [np.asarray(x) for x in (o, dq, dk, dv)]

    mono = run()
    monkeypatch.setenv("HYV_ULYSSES_CHUNKS", "2")
    chunked = run()
    for a, b_ in zip(mono, chunked):
        np.testing.assert_allclose(a, b_, atol=1e-6, rtol=1e-6)


def test_usp_chunked_matches_mono(devices8, monkeypatch):
    mesh = shd.make_usp_mesh(data=2, ring=2, ulysses=2, devices=devices8)
    b, l, n, d = 2, 64, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (b, l, n, d), jnp.float32) for kk in ks)

    def run():
        with jax.set_mesh(mesh):
            sh = NamedSharding(mesh, P("data", ("ring", "sp"), None, None))
            qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
            return np.asarray(jax.jit(usp_attention)(qs, ks_, vs))

    mono = run()
    monkeypatch.setenv("HYV_ULYSSES_CHUNKS", "2")
    np.testing.assert_allclose(run(), mono, atol=1e-6, rtol=1e-6)


_AOT_PROBE = r"""
import os, sys
sys.path.insert(0, os.environ["HYV_REPO"])
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from hyvideo_prfl_tpu.ops.attention import ulysses_attention

topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
mesh = Mesh(np.array(topo.devices).reshape(2, 4), ("data", "sp"))
B, Lper, N, D = 2, 1024, 20, 128
spec = P("data", "sp", None, None)
sh = NamedSharding(mesh, spec)
a = jax.ShapeDtypeStruct((B, Lper * 4, N, D), jnp.bfloat16, sharding=sh)
fn = lambda q, k, v: ulysses_attention(q, k, v, backend="flash",
                                       bounded_logits=True)
with jax.set_mesh(mesh):
    hlo = jax.jit(fn).lower(a, a, a).compile().as_text()
lines = hlo.splitlines()
starts = [i for i, l in enumerate(lines) if "all-to-all-start" in l]
dones = [i for i, l in enumerate(lines) if "all-to-all-done" in l]
cc = [i for i, l in enumerate(lines) if "custom-call" in l
      and "tpu_custom_call" in l]
spans = 0
for s in starts:
    d = min((x for x in dones if x > s), default=None)
    if d is not None and any(s < c < d for c in cc):
        spans += 1
print("RESULT", len(starts), len(cc), spans)
"""


def test_chunked_async_schedule_spans_flash():
    """Chipless v5e AOT compile with the async flags: the chunked Ulysses
    sandwich must emit async a2a start/done windows that span flash
    custom-calls in the final schedule (i.e. the overlap is real in the
    compiled program, not aspirational)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_INTERPRET": "0",
        "TPU_ACCELERATOR_TYPE": "v5litepod-8",
        "TPU_WORKER_HOSTNAMES": "localhost",
        "LIBTPU_INIT_ARGS": shd.ASYNC_COLLECTIVE_FLAGS,
        "HYV_ULYSSES_CHUNKS": "5",
        "HYV_REPO": REPO,
        "XLA_FLAGS": "",  # drop the 8-device CPU forcing for the AOT child
    })
    out = subprocess.run([sys.executable, "-c", _AOT_PROBE], env=env,
                         capture_output=True, text=True, timeout=560)
    if out.returncode != 0 and "get_topology_desc" in (out.stderr or ""):
        pytest.skip("chipless TPU AOT unavailable in this image")
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")][-1]
    _, n_async, n_flash, n_span = line.split()
    assert int(n_flash) == 5, line      # one kernel per head chunk
    assert int(n_async) >= 10, line     # a2a lowered async
    assert int(n_span) >= 1, line       # and overlap spans a flash call
