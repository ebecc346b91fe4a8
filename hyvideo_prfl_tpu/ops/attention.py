"""Attention dispatch for the video DiT.

Replaces the reference's flash-attn CUDA wrapper
(`wan/modules/attention.py:24-130`, flash_attn_varlen_func). TPU-native
strategy: fixed-shape padded sequences + key-validity masks instead of
varlen cu_seqlens (the Wan model pads to a fixed seq_len anyway,
model.py:584-587).

Two backends:
* "xla": einsum softmax attention with fp32 accumulation — always available,
  the correctness baseline; XLA fuses it reasonably well.
* "flash": Pallas TPU flash-attention kernel (ops/flash_attention.py),
  O(L) memory, used for the long-video hot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULT_BACKEND = "auto"


def multichip_context() -> bool:
    """True when tracing for a multi-device program: either this process
    has multiple devices, or an ambient multi-device mesh is set (AOT
    compilation against a chipless topology has jax.device_count() == 1
    but still partitions — raw Mosaic calls would fail there)."""
    if jax.device_count() > 1:
        return True
    try:
        mesh = jax.sharding.get_abstract_mesh()
        return mesh is not None and not mesh.empty and mesh.size > 1
    except Exception:
        return False


def shard_map_mesh_available() -> bool:
    """True when an ambient multi-device mesh is set, i.e. the explicit
    shard_map paths (ulysses/token-parallel attention) can be used."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        return mesh is not None and not mesh.empty and mesh.size > 1
    except Exception:
        return False


def _spec_axis_size(mesh, ax) -> int:
    if ax is None:
        return 1
    axes = ax if isinstance(ax, tuple) else (ax,)
    size = 1
    for a in axes:
        size *= mesh.shape.get(a, 1)
    return size


def token_parallel_applicable(b: int, lq: int, tokens_spec) -> bool:
    """Whether token_parallel_attention can run: an ambient multi-device
    mesh is set AND the batch/sequence dims divide their mesh axes exactly
    (shard_map, unlike GSPMD constraints, does not pad)."""
    if not shard_map_mesh_available():
        return False
    mesh = jax.sharding.get_abstract_mesh()
    return (b % _spec_axis_size(mesh, tokens_spec[0]) == 0
            and lq % _spec_axis_size(mesh, tokens_spec[1]) == 0)


def set_default_backend(name: str) -> None:
    global _DEFAULT_BACKEND
    assert name in ("auto", "xla", "flash")
    _DEFAULT_BACKEND = name


def get_default_backend() -> str:
    return _DEFAULT_BACKEND


def _resolve_auto(d: int, lk: int, lq: int = 0,
                  in_shard_map: bool = False) -> str:
    """auto: Pallas flash on TPU for long self-attention-sized sequences
    (where XLA would materialize the [Lq, Lk] logits in HBM), AND for
    short-key cross-attention once the query side is long: at lq=18,900 x
    lk=512 (the 14B 720p sp=4 shard) XLA's fp32 logits round-trip HBM and
    measure 24.7 ms fwd / 90.6 TF/s vs the kernel's single full-K block at
    17.3 ms / 129.2 TF/s (fwd+bwd 48.6 vs 40.7 ms, max |delta| 2.4e-4 —
    scripts/profile_cross_14b.py on v5e). Short-lq cross (bench scale,
    reward heads, CPU tests) stays on XLA einsum. Multi-device pjit
    programs get the custom_partitioning wrapper (ops/flash_sharded.py),
    so flash engages under GSPMD/Shardy too.

    "On TPU" is decided by the Pallas interpret-mode rule rather than the
    client backend: an AOT compile for a TPU topology runs in a CPU-client
    process (scripts/memory_audit_14b.py with PALLAS_INTERPRET=0) but must
    still take the flash path — XLA attention materializes [Lq, Lk]."""
    from .flash_attention import _interpret

    on_tpu = not _interpret()
    # cross threshold: flash beats XLA at every measured lq — 18,900
    # (17.3 vs 24.7 ms), 8,190 (7.0 vs 10.1), 3,120 (1.6 vs 2.2 fwd,
    # 2.9 vs 5.2 fwd+bwd). Below ~3k the op is negligible; stay XLA.
    big = lk >= 1024 or (lq >= 3072 and lk >= 128)
    return "flash" if (on_tpu and d % 128 == 0 and big) else "xla"


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_valid_len: Optional[jnp.ndarray] = None,
    backend: Optional[str] = None,
    qk_layout: str = "blnd",
    bounded_logits: bool = False,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """Multi-head attention. v is [B, Lk, N, D] (BLND); q and k are BLND, or
    head-major [B, N, L, D] with qk_layout="bnld" (the fused qknorm_rope
    kernel's output — also the flash kernel's internal layout, skipping a
    transpose). Returns [B, Lq, N, D] in q.dtype.

    k_valid_len: optional [B] int32; keys at positions >= k_valid_len[b] are
    masked out (the reference's k_lens semantics, attention.py:60-66).
    """
    bnld_in = qk_layout == "bnld"
    lk = k.shape[2] if bnld_in else k.shape[1]
    lq = q.shape[2] if bnld_in else q.shape[1]
    backend = backend or _DEFAULT_BACKEND
    if backend == "auto":
        backend = _resolve_auto(q.shape[-1], lk, lq)
    if backend == "flash":
        if multichip_context():
            import os

            if os.environ.get("HYV_NO_CUSTOM_PARTITIONING") == "1":
                # chipless AOT (scripts/memory_audit_14b.py): no emitter
                # for custom_partitioning — XLA attention upper-bounds
                return _xla_attention(q, k, v, k_valid_len, qk_layout)
            # partitionable wrapper: GSPMD/Shardy shards (batch, heads) and
            # inserts the Ulysses all_to_all around the per-device kernel
            from .flash_sharded import flash_attention_sharded

            if bnld_in:
                q = jnp.moveaxis(q, 1, 2)
                k = jnp.moveaxis(k, 1, 2)
            return flash_attention_sharded(q, k, v, k_valid_len=k_valid_len,
                                           bounded_logits=bounded_logits,
                                           qk_int8=qk_int8)
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, k_valid_len=k_valid_len,
                               qk_layout=qk_layout,
                               bounded_logits=bounded_logits,
                               qk_int8=qk_int8)
    return _xla_attention(q, k, v, k_valid_len, qk_layout)


def ulysses_chunks(n_heads: int, sp: int) -> int:
    """Head-chunking degree for the Ulysses sandwich (HYV_ULYSSES_CHUNKS,
    default 1 = monolithic). With C > 1 the q/k/v/o all_to_alls are issued
    per head-chunk so chunk i's attention kernel can overlap chunk i+1's
    all_to_all — XLA-TPU emits the a2a as async start/done pairs when
    `LIBTPU_INIT_ARGS=--xla_tpu_enable_async_all_to_all=true` (see
    parallel/sharding.async_collective_flags), and the compiled schedule
    then spans flash custom-calls with a2a windows (verified from AOT HLO,
    tests/test_ulysses_chunked.py). Clamped so every chunk keeps at least
    one head per device after the a2a; 1 when divisibility fails."""
    import os

    c = int(os.environ.get("HYV_ULYSSES_CHUNKS", "1"))
    if c <= 1:
        return 1
    c = min(c, n_heads // sp) if sp > 0 else c
    while c > 1 and (n_heads % (sp * c) != 0):
        c -= 1
    return max(c, 1)


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sp_axis: str = "sp",
    data_axis: str = "data",
    backend: Optional[str] = None,
    bounded_logits: bool = False,
    qk_int8: bool = False,
):
    """Explicit Ulysses sequence-parallel attention via shard_map.

    The compiled form of the reference's all_to_all_4D sandwich
    (communication.py:40-160 + model.py:183-196): tokens arrive sharded on
    `sp_axis` ([B, L/sp, N, D] per device); an all_to_all scatters heads and
    gathers sequence ([B, L, N/sp, D]), the per-device attention kernel
    (Pallas flash on TPU) runs on full-length sequences with a head subset,
    and the inverse all_to_all restores token sharding. JAX collectives
    differentiate natively, so this is trainable as-is.

    HYV_ULYSSES_CHUNKS > 1 splits the sandwich over head groups (identical
    numerics — heads are independent) so the per-chunk a2a can overlap the
    previous chunk's flash kernel under async-a2a lowering.

    Call under jax.set_mesh with a ("data", "sp") mesh; q/k/v must be
    sharded P(data, sp, None, None).
    """
    import jax
    from jax.sharding import PartitionSpec as P

    mesh = jax.sharding.get_abstract_mesh()
    spec = P(data_axis, sp_axis, None, None)
    sp = _spec_axis_size(mesh, sp_axis)
    chunks = ulysses_chunks(q.shape[2], sp)

    def one_chunk(q, k, v):
        def a2a_heads(x):  # [B, L/sp, Nc, D] -> [B, L, Nc/sp, D]
            return jax.lax.all_to_all(
                x, sp_axis, split_axis=2, concat_axis=1, tiled=True)

        qh, kh, vh = a2a_heads(q), a2a_heads(k), a2a_heads(v)
        be = backend or _DEFAULT_BACKEND
        if be == "auto":
            be = _resolve_auto(qh.shape[-1], kh.shape[1], qh.shape[1],
                               in_shard_map=True)
        if be == "flash":
            # inside shard_map the kernel is already per-device: call the
            # plain kernel, never the custom_partitioning wrapper
            from .flash_attention import flash_attention

            o = flash_attention(qh, kh, vh, bounded_logits=bounded_logits,
                                qk_int8=qk_int8)
        else:
            o = _xla_attention(qh, kh, vh, None)
        # inverse: scatter seq, gather heads
        return jax.lax.all_to_all(
            o, sp_axis, split_axis=1, concat_axis=2, tiled=True)

    def inner(q, k, v):
        if chunks == 1:
            return one_chunk(q, k, v)
        nc = q.shape[2] // chunks
        outs = [one_chunk(q[:, :, i * nc:(i + 1) * nc],
                          k[:, :, i * nc:(i + 1) * nc],
                          v[:, :, i * nc:(i + 1) * nc])
                for i in range(chunks)]
        return jnp.concatenate(outs, axis=2)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the vma checker rejects inside shard_map
    return jax.shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def token_parallel_attention(q, k, v, tokens_spec, qk_layout: str = "blnd",
                             bounded_logits: bool = False):
    """Sequence-parallel CROSS attention: q rows stay token-sharded, the
    short k/v context is replicated — each device runs the local kernel on
    its own q chunk against the full keys. Attention rows are independent,
    so the forward needs ZERO collectives; shard_map's transpose inserts
    the psum that homes the replicated k/v cotangents.

    This is the layout GSPMD already picks for the einsum path; the explicit
    shard_map lets the Pallas flash kernel run per-device instead (at the
    14B 720p sp=4 shard — lq 18,900 x lk 512 — flash measures 17.3 ms fwd
    vs 24.7 XLA, 40.7 vs 48.6 fwd+bwd; scripts/profile_cross_14b.py).
    Reference parity: cross attention never masks context tokens
    (model.py:597 context_lens=None).

    tokens_spec: the policy's [B, L, D] token PartitionSpec — axis 0 names
    the batch mesh axes, axis 1 the sequence mesh axes (a tuple under USP).
    """
    from jax.sharding import PartitionSpec as P

    mesh = jax.sharding.get_abstract_mesh()
    b_ax, seq_ax = tokens_spec[0], tokens_spec[1]
    rep = P(b_ax, None, None, None)
    qspec = (P(b_ax, None, seq_ax, None) if qk_layout == "bnld"
             else P(b_ax, seq_ax, None, None))

    def inner(q, k, v):
        lq = q.shape[2] if qk_layout == "bnld" else q.shape[1]
        lk = k.shape[2] if qk_layout == "bnld" else k.shape[1]
        be = _resolve_auto(q.shape[-1], lk, lq, in_shard_map=True)
        if be == "flash":
            from .flash_attention import flash_attention

            return flash_attention(q, k, v, qk_layout=qk_layout,
                                   bounded_logits=bounded_logits)
        return _xla_attention(q, k, v, None, qk_layout=qk_layout)

    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(qspec, rep, rep),
        out_specs=P(b_ax, seq_ax, None, None),
        check_vma=False,
    )(q, k, v)


def _xla_attention(q, k, v, k_valid_len, qk_layout="blnd"):
    orig_dtype = q.dtype
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    # [B, N, Lq, Lk] logits with fp32 accumulation on the MXU
    qk_eq = ("bnqd,bnkd->bnqk" if qk_layout == "bnld"
             else "bqnd,bknd->bnqk")
    logits = jnp.einsum(
        qk_eq, q, k, preferred_element_type=jnp.float32
    ) * scale
    if k_valid_len is not None:
        lk = k.shape[1]
        key_ids = jnp.arange(lk, dtype=jnp.int32)
        mask = key_ids[None, :] < k_valid_len[:, None]  # [B, Lk]
        logits = jnp.where(mask[:, None, None, :], logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bnqk,bknd->bqnd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(orig_dtype)
