"""Hamming-distance descriptor matching on the MXU.

Role of the reference's ORB brute-force matcher
(`kimera_multi_lcd::computeMatchedIndices` = knnMatch, 2-NN, Lowe ratio 0.7;
images/kimera-multi.drawio:2583, params/D455/LcdParams.yaml:16).

TPU-native formulation: packed 256-bit ORB descriptors (K, 32) uint8 are
unpacked once to a {0,1} bit matrix (K, 256); then the full Hamming distance
matrix is a single MXU matmul:

    ham(a, b) = popcount(a XOR b) = |a| + |b| - 2 a.b

so  D = ra[:, None] + rb[None, :] - 2 A @ B^T,  with A, B in {0,1}^(K, 256).
256 is exactly two MXU lanes of 128 — ideal contraction size. bf16 inputs
with f32 accumulation are exact (values are 0/1, sums <= 256 << 2^8).

A Pallas kernel fuses unpack+matmul+2NN for large databases; the XLA path
below is the reference implementation (identical semantics) and is what runs
on CPU in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BITS = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)


def _is_tpu_backend() -> bool:
    from ..core.backend import is_tpu

    return is_tpu()


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """(..., 32) uint8 -> (..., 256) bits in {0, 1} (uint8), LSB-first per
    byte (matches numpy.unpackbits(bitorder='little'))."""
    b = (desc[..., :, None] & _BITS[None, :]) > 0
    return b.reshape(*desc.shape[:-1], desc.shape[-1] * 8).astype(jnp.uint8)


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Full Hamming distance matrix between packed descriptor sets.

    desc_a: (Ka, 32) uint8; desc_b: (Kb, 32) uint8 -> (Ka, Kb) int32.
    """
    A = unpack_bits(desc_a).astype(jnp.bfloat16)
    B = unpack_bits(desc_b).astype(jnp.bfloat16)
    ra = jnp.sum(A, axis=-1, dtype=jnp.float32)
    rb = jnp.sum(B, axis=-1, dtype=jnp.float32)
    ab = jax.lax.dot_general(
        A,
        B,
        dimension_numbers=(((A.ndim - 1,), (B.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = ra[..., :, None] + rb[..., None, :] - 2.0 * ab
    return d.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_distance",))
def knn2_lowe_match(
    desc_q: jnp.ndarray,
    valid_q: jnp.ndarray,
    desc_t: jnp.ndarray,
    valid_t: jnp.ndarray,
    lowe_ratio: jnp.ndarray | float = 0.7,
    max_distance: int = 256,
):
    """2-NN matching with Lowe ratio test (reference semantics:
    `computeMatchedIndices` — knnMatch k=2, keep if d1 < ratio * d2).

    Invalid rows/cols are masked to distance 2*256 (beyond any real one).

    Returns (match_idx (Kq,) int32 — index into target, -1 if rejected;
             match_dist (Kq,) int32).
    """
    D = hamming_matrix(desc_q, desc_t).astype(jnp.float32)
    big = 512.0
    D = jnp.where(valid_t[None, :], D, big)
    # two smallest along the target axis via double min-reduction (top_k
    # lowers to a full sort per row on TPU — far more expensive for k=2)
    d1 = jnp.min(D, axis=1)
    best = jnp.argmin(D, axis=1).astype(jnp.int32)
    D2 = D.at[jnp.arange(D.shape[0]), best].set(big)
    d2 = jnp.min(D2, axis=1)
    ok = (
        valid_q
        & (d1 < lowe_ratio * d2)
        & (d1 <= float(max_distance))
        & (d1 < big)
    )
    return jnp.where(ok, best, -1).astype(jnp.int32), d1.astype(jnp.int32)


def knn2_lowe_match_batch(desc_q, valid_q, desc_t, valid_t, lowe_ratio=0.7):
    """vmapped variant over a leading candidate-pair batch axis."""
    fn = jax.vmap(
        lambda dq, vq, dt, vt: knn2_lowe_match(dq, vq, dt, vt, lowe_ratio)
    )
    return fn(desc_q, valid_q, desc_t, valid_t)


# ---------------------------------------------------------------------------
# Pallas pair-matching: the whole (Kq, Kt) distance matrix of one candidate
# pair lives in VMEM; the matmul + top-2 reduction never touch HBM. vmapped
# over the candidate batch (the batch axis becomes the leading grid dim).
# ---------------------------------------------------------------------------


def _pair_top2_kernel(dq_ref, dt_ref, vt_ref, d1_ref, d2_ref, i1_ref):
    """Inputs are the RAW packed uint8 descriptors; bits unpack in VMEM.

    Materializing the unpacked (C, K, 256) bf16 bit arrays in HBM (then
    copying one of them transposed) moved ~100 MB per verification batch
    at a measured ~50 GB/s effective — most of the match stage. The raw
    descriptors are 2.8 MB. The in-kernel unpack emits bit columns in
    bit-major order (all bytes' bit 0, then bit 1, ...) which is a fixed
    permutation of the reference layout — Hamming distances are
    permutation-invariant, so results are identical."""
    dq = dq_ref[...].astype(jnp.int32)  # (Kq, 32) packed bytes
    dt = dt_ref[...].astype(jnp.int32)  # (Kt, 32)
    vt = vt_ref[...]  # (1, Kt) f32 valid flags
    qb = jnp.concatenate(
        [((dq >> b) & 1) for b in range(8)], axis=1).astype(jnp.bfloat16)
    tb = jnp.concatenate(
        [((dt >> b) & 1) for b in range(8)], axis=1).astype(jnp.bfloat16)
    rq = jnp.sum(qb.astype(jnp.float32), axis=-1, keepdims=True)
    # invalid/padded target columns get a huge additive term, taking
    # them out of both top-2 slots (matches the XLA path's masking)
    rt = (jnp.sum(tb.astype(jnp.float32), axis=-1)[None, :]
          + (1.0 - vt) * 1e9)
    # precision=DEFAULT: {0,1} bf16 bits with f32 accumulation are exact,
    # and Mosaic rejects bf16 MXU ops under the package-wide HIGHEST
    # default (it would need a multi-pass decomposition)
    ab = jax.lax.dot_general(
        qb, tb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    d = rq + rt - 2.0 * ab  # (Kq, Kt) — exact integers for valid cols
    d1 = jnp.min(d, axis=1, keepdims=True)
    i1 = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.min(jnp.where(cols == i1, 1e30, d), axis=1, keepdims=True)
    d1_ref[...] = d1
    d2_ref[...] = d2
    i1_ref[...] = i1


def _pair_top2(desc_q, desc_t, vt, interpret=False):
    """Single-pair top-2 search; desc_q: (Kq, 32) uint8, desc_t:
    (Kt, 32) uint8, vt: (1, Kt) f32 valid flags. Returns
    (d1 (Kq,), d2 (Kq,), i1 (Kq,))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Kq = desc_q.shape[0]
    outs = pl.pallas_call(
        _pair_top2_kernel,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Kq, 1), jnp.float32),
            jax.ShapeDtypeStruct((Kq, 1), jnp.float32),
            jax.ShapeDtypeStruct((Kq, 1), jnp.int32),
        ],
    )(desc_q, desc_t, vt)
    return outs[0][:, 0], outs[1][:, 0], outs[2][:, 0]


def knn2_lowe_match_pairs(
    desc_q: jnp.ndarray,
    valid_q: jnp.ndarray,
    desc_t: jnp.ndarray,
    valid_t: jnp.ndarray,
    lowe_ratio: float = 0.7,
    max_distance: int = 256,
    interpret: bool = False,
):
    """Batched pair matching — reference semantics of `knn2_lowe_match`
    over a candidate axis: desc_* (C, K, 32) uint8, valid_* (C, K).

    On TPU the distance matrix + top-2 run in a fused Pallas kernel (one
    grid step per candidate pair); elsewhere falls back to the vmapped XLA
    path. Returns (match_idx (C, Kq) int32 — -1 if rejected; d1 (C, Kq)
    int32, clipped to the XLA path's 512 no-match sentinel).
    """
    if not (_is_tpu_backend() or interpret):
        fn = jax.vmap(lambda dq, vq, dt, vt: knn2_lowe_match(
            dq, vq, dt, vt, lowe_ratio, max_distance=max_distance))
        return fn(desc_q, valid_q, desc_t, valid_t)

    C, Kq, _ = desc_q.shape
    Kt = desc_t.shape[1]
    pad_q = (-Kq) % 128
    pad_t = (-Kt) % 128
    if pad_q:
        desc_q = jnp.pad(desc_q, ((0, 0), (0, pad_q), (0, 0)))
        valid_q = jnp.pad(valid_q, ((0, 0), (0, pad_q)))
    if pad_t:
        desc_t = jnp.pad(desc_t, ((0, 0), (0, pad_t), (0, 0)))
        valid_t = jnp.pad(valid_t, ((0, 0), (0, pad_t)))
    vt = valid_t.astype(jnp.float32)[:, None, :]  # (C, 1, Ktp)
    d1, d2, i1 = jax.vmap(
        lambda a, b, c: _pair_top2(a, b, c, interpret=interpret)
    )(desc_q, desc_t, vt)
    ok = (
        valid_q
        & (d1 < lowe_ratio * d2)
        & (d1 <= float(max_distance))
    )
    m = jnp.where(ok, i1, -1).astype(jnp.int32)
    d1c = jnp.minimum(d1, 512.0).astype(jnp.int32)
    return m[:, :Kq], d1c[:, :Kq]


# ---------------------------------------------------------------------------
# Pallas kernel: tiled Hamming top-2 for large databases (detection-side
# scoring over the full sharded descriptor DB). Grid over query tiles;
# K-dim streamed through VMEM.
# ---------------------------------------------------------------------------


def _hamming_top2_kernel(q_ref, t_ref, rt_ref, d1_ref, d2_ref, i1_ref):
    import jax.numpy as jnp  # noqa: F811

    q = q_ref[...]  # (TQ, 256) bf16 bits
    t = t_ref[...]  # (TT, 256) bf16 bits
    rt = rt_ref[...]  # (1, TT) f32 row sums of t
    rq = jnp.sum(q.astype(jnp.float32), axis=-1, keepdims=True)
    # transpose t in-kernel so the contraction is lhs-minor x rhs-major,
    # and force DEFAULT precision (exact for {0,1} bits; Mosaic rejects
    # bf16 MXU ops under the package-wide HIGHEST default)
    ab = jax.lax.dot_general(
        q, t.T, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    d = rq + rt - 2.0 * ab  # (TQ, TT)
    j = pl_program_id_1()
    # running top-2 merge across target tiles
    @_pl_when(j == 0)
    def _init():
        d1_ref[...] = jnp.full_like(d1_ref[...], 1e9)
        d2_ref[...] = jnp.full_like(d2_ref[...], 1e9)
        i1_ref[...] = jnp.full_like(i1_ref[...], -1)

    neg, idx = jax.lax.top_k(-d, 2)
    nd1, nd2 = -neg[:, 0:1], -neg[:, 1:2]
    nidx = idx[:, 0:1] + j * t.shape[0]

    od1, od2, oi1 = d1_ref[...], d2_ref[...], i1_ref[...]
    # merge (od1, od2) with (nd1, nd2)
    new_d1 = jnp.minimum(od1, nd1)
    new_i1 = jnp.where(nd1 < od1, nidx, oi1)
    new_d2 = jnp.minimum(jnp.maximum(od1, nd1), jnp.minimum(od2, nd2))
    d1_ref[...] = new_d1
    d2_ref[...] = new_d2
    i1_ref[...] = new_i1


def pl_program_id_1():
    from jax.experimental import pallas as pl

    return pl.program_id(1)


def _pl_when(cond):
    from jax.experimental import pallas as pl

    return pl.when(cond)


def hamming_top2_pallas(bits_q: jnp.ndarray, bits_t: jnp.ndarray, tile_q=128, tile_t=512):
    """Tiled top-2 Hamming search: bits_* are {0,1} bf16 matrices
    (Kq, 256)/(Kt, 256), Kq % tile_q == 0, Kt % tile_t == 0.

    Returns (d1 (Kq,), d2 (Kq,), i1 (Kq,)) — best/second distances (f32) and
    best index. Used on TPU for DB-wide matching; tests check it against
    hamming_matrix + top_k.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Kq, C = bits_q.shape
    Kt, _ = bits_t.shape
    rt = jnp.sum(bits_t.astype(jnp.float32), axis=-1)[None, :]  # (1, Kt)

    grid = (Kq // tile_q, Kt // tile_t)
    out_shape = [
        jax.ShapeDtypeStruct((Kq, 1), jnp.float32),
        jax.ShapeDtypeStruct((Kq, 1), jnp.float32),
        jax.ShapeDtypeStruct((Kq, 1), jnp.int32),
    ]
    d1, d2, i1 = pl.pallas_call(
        _hamming_top2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, C), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_t, C), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile_t), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0)),
        ],
        out_shape=out_shape,
        interpret=not _is_tpu_backend(),
    )(bits_q, bits_t, rt)
    return d1[:, 0], d2[:, 0], i1[:, 0]
