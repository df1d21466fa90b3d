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


def _sample_gather_kernel(picksT_ref, dataT_ref, out_ref, *, k: int, D: int):
    picksT = picksT_ref[...]  # (k, TH) int32
    dataT = dataT_ref[...]  # (D, K) f32
    K = dataT.shape[1]
    TH = picksT.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (K, TH), 0)
    for m in range(k):
        ohT = (iota == picksT[m:m + 1, :]).astype(jnp.float32)  # (K, TH)
        res = jax.lax.dot_general(
            dataT, ohT, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (D, TH)
        out_ref[m * D:(m + 1) * D, :] = res


def sample_gather_t(data: jnp.ndarray, picks: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Gather minimal samples, hypothesis-minor.

    data: (K, D) f32; picks: (H, k) int32 in [0, K).
    Returns (k * D, H): out[m * D + i, h] = data[picks[h, m], i].
    """
    H, k = picks.shape
    K, D = data.shape
    if not (_use_pallas() or interpret):
        g = data[picks]  # (H, k, D)
        return jnp.moveaxis(g, 0, -1).reshape(k * D, H)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pad = (-H) % _TILE_H
    picksT = picks.T  # (k, H)
    if pad:
        picksT = jnp.pad(picksT, ((0, 0), (0, pad)))
    Hp = picksT.shape[1]

    out = pl.pallas_call(
        functools.partial(_sample_gather_kernel, k=k, D=D),
        grid=(Hp // _TILE_H,),
        in_specs=[
            pl.BlockSpec((k, _TILE_H), lambda h: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, K), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * D, _TILE_H), lambda h: (0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * D, Hp), jnp.float32),
        interpret=interpret,
    )(picksT, data.T)
    return out[:, :H]
