"""Minimal-sample gathers as one-hot MXU matmuls (Pallas on TPU).

RANSAC consumes its correspondence data through tiny random gathers:
(n_hyp, k) sampled indices into a (K, 3) point array. TPU gathers execute
near-serially — the vmapped scalar gather was the single most expensive
op of the whole verification pipeline (35 ms/batch, 65% of runtime).

A gather is a one-hot matmul: out[h] = onehot(picks[h]) @ data. The MXU
does this three orders of magnitude faster than the gather unit — but the
(n_hyp * k, K) one-hot matrix must never reach HBM, so the kernel builds
each hypothesis tile's one-hot in VMEM (an iota compare) and contracts it
with the point data on the spot.

Output layout is transposed — (k * D, H) with the hypothesis axis minor —
so the SoA solvers (kernels/soa.py) slice full 128-lane rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_TILE_H = 128


def _use_pallas() -> bool:
    from ..core.backend import is_tpu

    return is_tpu()


def _sample_gather_kernel(picksT_ref, data_ref, out_ref, *, k: int, D: int):
    picksT = picksT_ref[...]  # (k, TH) int32
    data = data_ref[...]  # (D, K) f32 SoA — coordinate-major, matching
    # the pipeline-wide point layout (a (K, 3) operand pads its 3-lane
    # minor dim to a full 128-lane tile in VMEM/HBM)
    K = data.shape[1]
    TH = picksT.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (K, TH), 0)
    for m in range(k):
        ohT = (iota == picksT[m:m + 1, :]).astype(jnp.float32)  # (K, TH)
        res = jax.lax.dot_general(
            data, ohT, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (D, TH)
        out_ref[m * D:(m + 1) * D, :] = res


def _sample_gather_perm_kernel(picksT_ref, data_ref, invp_ref, out_ref,
                               *, k: int, D: int):
    """Fused permutation+sample gather: row j is selected for pick value
    v when inv_perm[j] == v — i.e. out = data[perm[picks]] without ever
    materializing perm[picks] (a (H, k) scalar gather that profiled at
    3.3 ms/batch) or data[perm] (a (K, D) row gather per candidate)."""
    picksT = picksT_ref[...]   # (k, TH) int32
    data = data_ref[...]       # (D, K) f32 SoA
    invp = invp_ref[...]       # (K, 1) int32 — inverse permutation
    TH = picksT.shape[1]
    for m in range(k):
        ohT = (invp == picksT[m:m + 1, :]).astype(jnp.float32)  # (K, TH)
        res = jax.lax.dot_general(
            data, ohT, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (D, TH)
        out_ref[m * D:(m + 1) * D, :] = res


def sample_gather_t(data: jnp.ndarray, picks: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Gather minimal samples, hypothesis-minor.

    data: (D, K) f32 SoA; picks: (H, k) int32 in [0, K).
    Returns (k * D, H): out[m * D + i, h] = data[i, picks[h, m]].
    """
    H, k = picks.shape
    D, K = data.shape
    if not (_use_pallas() or interpret):
        g = data[:, picks]  # (D, H, k)
        return jnp.transpose(g, (2, 0, 1)).reshape(k * D, H)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = 512 if H > 256 else _TILE_H
    pad = (-H) % tile
    picksT = picks.T  # (k, H)
    if pad:
        picksT = jnp.pad(picksT, ((0, 0), (0, pad)))
    Hp = picksT.shape[1]

    out = pl.pallas_call(
        functools.partial(_sample_gather_kernel, k=k, D=D),
        grid=(Hp // tile,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda h: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, K), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * D, tile), lambda h: (0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * D, Hp), jnp.float32),
        interpret=interpret,
    )(picksT, data)
    return out[:, :H]


def sample_gather_perm_t(data: jnp.ndarray, picks: jnp.ndarray,
                         order: jnp.ndarray, inv_order: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Permuted minimal-sample gather, hypothesis-minor.

    Equivalent to sample_gather_t(data[order], order-composed picks) but
    with the permutation folded into the one-hot compare (TPU) so
    neither data[order] nor order[picks] is ever materialized.

    data: (D, K) SoA; picks: (H, k) indices into the PERMUTED space;
    order: (K,) the permutation (used by the XLA fallback);
    inv_order: (K,) its inverse (inv_order[order[j]] == j).
    Returns (k * D, H): out[m * D + i, h] = data[i, order[picks[h, m]]].
    """
    H, k = picks.shape
    D, K = data.shape
    if not (_use_pallas() or interpret):
        g = data[:, order[picks]]  # (D, H, k)
        return jnp.transpose(g, (2, 0, 1)).reshape(k * D, H)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = 512 if H > 256 else _TILE_H
    pad = (-H) % tile
    picksT = picks.T
    if pad:
        picksT = jnp.pad(picksT, ((0, 0), (0, pad)))
    Hp = picksT.shape[1]

    out = pl.pallas_call(
        functools.partial(_sample_gather_perm_kernel, k=k, D=D),
        grid=(Hp // tile,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda h: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, K), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * D, tile), lambda h: (0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * D, Hp), jnp.float32),
        interpret=interpret,
    )(picksT, data, inv_order.astype(jnp.int32)[:, None])
    return out[:, :H]


def _permute_cols_kernel(idx_ref, data_ref, out_ref):
    idx = idx_ref[...]   # (1, K) int32: out column k <- data column idx[k]
    data = data_ref[...]  # (D, K)
    K = data.shape[1]
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    oh = (iota_j == idx).astype(jnp.float32)  # oh[j, k] = (j == idx[k])
    out_ref[...] = jax.lax.dot_general(
        data, oh, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def permute_cols(data: jnp.ndarray, idx: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """Column permutation as a one-hot MXU matmul: out[:, k] =
    data[:, idx[k]].

    The matched-reorder step of verification (aligning target bearings/
    landmarks by match index) is a gather along the LANE dimension of an
    SoA array — XLA lowers that as transpose + row gather + transpose
    (two layout-change copies per array per candidate, visible as the
    residual copy-start ops in the round-4 device profile). One
    (K, K) one-hot contraction stays entirely in VMEM.

    data: (D, K); idx: (K,) int32 in [0, K). Returns (D, K).
    """
    if not (_use_pallas() or interpret):
        return data[:, idx]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, K = data.shape
    out = pl.pallas_call(
        _permute_cols_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, K), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32)[None, :], data.astype(jnp.float32))
    return out
