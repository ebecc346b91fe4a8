"""Cross-topology / cross-strategy checkpoint resume (scale-out
elasticity): a run saved on one mesh shape + FSDP strategy must resume on
a different mesh shape + strategy with bit-identical training state.

This is the production pod reality the reference handles via FSDP
FULL_STATE_DICT (save gathers to host, load re-shards —
model_utils.py:120-141): our orbax-native path instead saves SHARDED
arrays and re-shards at restore through the trainers' exact recipe
(ck.load_orbax(like=<new-topology state>) + device_put onto the new
shardings, scripts/train_prfl.py opt_resume / train_pavrm.py resume).

Pinned here:
  * params saved from a (data=2, sp=4) "full" state restore onto a
    (data=4, sp=2) "hybrid_full" layout with identical values
  * AdamW moments (incl. optax counters) survive the same move
  * the next optimizer step after the move equals the step the original
    topology would have taken (resume is invisible to the math)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyvideo_prfl_tpu.parallel import sharding as shd
from hyvideo_prfl_tpu.training import common
from hyvideo_prfl_tpu.utils import checkpoint as ck

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _params():
    rng = np.random.RandomState(0)
    return {
        "w1": jnp.asarray(rng.randn(256, 256), jnp.float32),
        "w2": jnp.asarray(rng.randn(256, 512) * 0.5, jnp.float32),
        "b": jnp.asarray(rng.randn(512), jnp.float32),
        "tiny": jnp.ones((4,), jnp.float32),
    }


def test_resume_across_mesh_shape_and_strategy(tmp_path):
    from scripts._common import make_sharded_state

    params = _params()
    tx = common.make_optimizer(learning_rate=1e-2)
    grads = jax.tree.map(lambda a: jnp.full_like(a, 0.1), params)

    # --- original topology: (data=2, sp=4), strategy "full", one step ---
    mesh_a = shd.make_mesh(data=2, sp=4, devices=jax.devices()[:8])
    with jax.set_mesh(mesh_a):
        state_a, _, _ = make_sharded_state(mesh_a, params, tx,
                                           strategy="full")
        step_a = jax.jit(lambda s, g: common.apply_grads(s, tx, g))
        state_a, _ = step_a(state_a, grads)
        # the would-have-been step 2 on the original topology
        state_a2, _ = jax.jit(lambda s, g: common.apply_grads(s, tx, g))(
            jax.tree.map(lambda x: x, state_a), grads)

    ck.save_orbax(str(tmp_path / "params"), state_a.params)
    ck.save_orbax(str(tmp_path / "opt"), state_a.opt_state)
    want_params = jax.tree.map(np.asarray, state_a.params)
    want_next = jax.tree.map(np.asarray, state_a2.params)

    # --- new topology: (data=4, sp=2), strategy "hybrid_full" ---
    mesh_b = shd.make_mesh(data=4, sp=2, devices=jax.devices()[:8])
    with jax.set_mesh(mesh_b):
        state_b, _, shardings_b = make_sharded_state(mesh_b, params, tx,
                                                     strategy="hybrid_full")
        restored_p = ck.load_orbax(str(tmp_path / "params"),
                                   like=state_b.params)
        restored_p = jax.device_put(restored_p, shardings_b.params)
        restored_o = ck.load_orbax(str(tmp_path / "opt"),
                                   like=state_b.opt_state)
        restored_o = jax.device_put(restored_o, shardings_b.opt_state)
        state_b = state_b.replace(params=restored_p, opt_state=restored_o,
                                  step=state_b.step + 1)

        # values identical post-move
        got = jax.tree.map(np.asarray, state_b.params)
        for k in want_params:
            np.testing.assert_array_equal(got[k], want_params[k], err_msg=k)

        # layout is the NEW strategy: weights never shard the "data" axis
        for leaf in jax.tree.leaves(state_b.params):
            spec_axes = {a for part in leaf.sharding.spec if part
                         for a in (part if isinstance(part, tuple)
                                   else (part,))}
            assert shd.DATA_AXIS not in spec_axes, leaf.sharding

        # the next step equals the step the original topology would take
        # (moments + optax counters carried exactly)
        state_b2, _ = jax.jit(lambda s, g: common.apply_grads(s, tx, g))(
            state_b, grads)
        got_next = jax.tree.map(np.asarray, state_b2.params)
        for k in want_next:
            np.testing.assert_allclose(got_next[k], want_next[k], atol=1e-7,
                                       err_msg=k)


def test_resume_onto_fewer_devices(tmp_path):
    """Save on the 8-device mesh, restore on a 4-device (data=1, sp=4)
    mesh — the elastic-downsize case (e.g. pod -> single slice)."""
    from scripts._common import make_sharded_state

    params = _params()
    tx = common.make_optimizer(learning_rate=1e-2)
    grads = jax.tree.map(lambda a: jnp.full_like(a, 0.1), params)

    mesh_a = shd.make_mesh(data=2, sp=4, devices=jax.devices()[:8])
    with jax.set_mesh(mesh_a):
        state_a, _, _ = make_sharded_state(mesh_a, params, tx,
                                           strategy="full")
        state_a, _ = jax.jit(lambda s, g: common.apply_grads(s, tx, g))(
            state_a, grads)
    ck.save_orbax(str(tmp_path / "params"), state_a.params)
    want = jax.tree.map(np.asarray, state_a.params)

    mesh_b = shd.make_mesh(data=1, sp=4, devices=jax.devices()[:4])
    with jax.set_mesh(mesh_b):
        state_b, _, shardings_b = make_sharded_state(mesh_b, params, tx,
                                                     strategy="full")
        restored = ck.load_orbax(str(tmp_path / "params"),
                                 like=state_b.params)
        restored = jax.device_put(restored, shardings_b.params)
        got = jax.tree.map(np.asarray, restored)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
        assert all(d in jax.devices()[:4]
                   for leaf in jax.tree.leaves(restored)
                   for d in leaf.sharding.device_set)
