"""Fused RANSAC hypothesis scoring (Pallas on TPU, XLA reference elsewhere).

Scoring is the HBM-bound half of batched RANSAC: naive formulations
materialize (H, K, 3) residual tensors per candidate (hundreds of MB per
verification batch). These kernels compute inlier COUNTS per hypothesis in
VMEM tiles — the residual matrices never leave the chip:

  * the (K,)-point data is loaded once per hypothesis tile,
  * per-tile residuals are (TILE_H, K) MXU matmul outputs,
  * the (H,) counts are the only HBM writes.

The winning hypothesis's inlier MASK is recomputed afterwards for the
single best model (cheap, XLA). Role of the per-correspondence scoring
loop inside opengv's RANSAC (SURVEY.md section 3.2 hot loop).

Both kernels have an algebraically identical XLA path used on CPU (tests)
— per backend the two RANSAC stages (counts, final mask) always use one
consistent arithmetic, which keeps the hypothesis-sharded variant
(dist/sharded_verify.py) bitwise equal to the single-chip one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _use_pallas() -> bool:
    from ..core.backend import is_tpu

    return is_tpu()


def _pad_h(x, tile=128):
    H = x.shape[0]
    pad = (-H) % tile
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _pick_tile(Hp: int) -> int:
    """Largest hypothesis tile that divides Hp — per-grid-step overhead
    dominates these small kernels, so fewer/bigger steps win (VMEM holds
    a (512, K) residual tile comfortably for K ~ 1k)."""
    for t in (512, 256, 128):
        if Hp % t == 0:
            return t
    return 128


# ---------------------------------------------------------------------------
# rigid (3d3d Arun) hypothesis counts:
#   d2(h, k) = || q_k - (R_h p_k + t_h) ||^2 ;  count_h = #{k : d2 < thr2}
# ---------------------------------------------------------------------------


def _rigid_counts_kernel(R9_ref, t3_ref, p_ref, q_ref, valid_ref, out_ref,
                         *, thr2: float):
    """Point operands in the pipeline-wide SoA (3, K) layout —
    coordinate rows slice directly, no transposed copies anywhere."""
    R9 = R9_ref[...]  # (TH, 9) row-major rotations
    t3 = t3_ref[...]  # (TH, 3)
    p = p_ref[...]  # (3, K)
    q = q_ref[...]  # (3, K)
    valid = valid_ref[...]  # (1, K) f32
    d2 = None
    for i in range(3):
        Rp = jax.lax.dot_general(
            R9[:, 3 * i:3 * i + 3], p,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TH, K)
        r = q[i:i + 1, :] - Rp - t3[:, i:i + 1]
        d2 = r * r if d2 is None else d2 + r * r
    inl = jnp.where((d2 < thr2) & (valid > 0.5), 1.0, 0.0)
    out_ref[...] = jnp.sum(inl, axis=1, keepdims=True).astype(jnp.int32)


def rigid_counts_ref(R, t, p, q, valid, threshold):
    """XLA reference scoring (identical math; used on CPU). SoA points."""
    thr2 = float(threshold) * float(threshold)
    resid = q[None, :, :] - (
        jnp.einsum("hij,jk->hik", R, p) + t[:, :, None])
    d2 = jnp.sum(resid * resid, axis=1)
    return jnp.sum((d2 < thr2) & valid[None, :], axis=1).astype(jnp.int32)


def rigid_counts(R: jnp.ndarray, t: jnp.ndarray, p: jnp.ndarray,
                 q: jnp.ndarray, valid: jnp.ndarray,
                 threshold: float, interpret: bool = False) -> jnp.ndarray:
    """Inlier counts for rigid-transform hypotheses.

    R: (H, 3, 3); t: (H, 3); p, q: (3, K) SoA; valid: (K,) bool.
    Returns (H,) int32.
    """
    thr2 = float(threshold) * float(threshold)
    if not (_use_pallas() or interpret):
        return rigid_counts_ref(R, t, p, q, valid, threshold)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = R.shape[0]
    R9 = _pad_h(R.reshape(H, 9))
    t3 = _pad_h(t)
    Hp = R9.shape[0]
    tile_h = _pick_tile(Hp)
    vf = valid.astype(jnp.float32)[None, :]  # (1, K)
    K = p.shape[1]

    counts = pl.pallas_call(
        functools.partial(_rigid_counts_kernel, thr2=thr2),
        grid=(Hp // tile_h,),
        in_specs=[
            pl.BlockSpec((tile_h, 9), lambda h: (h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, 3), lambda h: (h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, 1), lambda h: (h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, 1), jnp.int32),
        interpret=interpret,
    )(R9, t3, p, q, vf)
    return counts[:H, 0]


# ---------------------------------------------------------------------------
# essential-matrix hypothesis counts (squared Sampson error, matching
# minimal.sampson_error):
#   num = f2^T E f1 ;  den = (E f1)_x^2 + (E f1)_y^2 + (E^T f2)_x^2
#         + (E^T f2)_y^2 ;  err = num^2 / max(den, eps)
# ---------------------------------------------------------------------------


def _essential_counts_kernel(E9_ref, g_ref, f1_ref, f2_ref,
                             valid_ref, out_ref, *, thr: float):
    """All point operands in the pipeline-wide SoA (3, K)/(9, K) layout
    (a (K, 3) array pads its 3-lane minor dim to a 128-lane tile — 42x
    physical HBM, measured as the round-4 profile's dominant staging
    copies). E^T's rows are column-reorders of E9, sliced in VMEM, so
    the caller never materializes a transposed model table either."""
    E9 = E9_ref[...]  # (TH, 9) row-major E
    g = g_ref[...]  # (9, K): g[3i+j, k] = f2[i, k] * f1[j, k]
    f1 = f1_ref[...]  # (3, K)
    f2 = f2_ref[...]
    valid = valid_ref[...]  # (1, K)

    num = jax.lax.dot_general(
        E9, g, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (TH, K)
    den = None
    for i in range(2):  # only x, y components enter the denominator
        Ef1_i = jax.lax.dot_general(
            E9[:, 3 * i:3 * i + 3], f1,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        Eti = jnp.concatenate(
            [E9[:, c * 3 + i:c * 3 + i + 1] for c in range(3)],
            axis=1)  # (TH, 3) row i of E^T
        Etf2_i = jax.lax.dot_general(
            Eti, f2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        term = Ef1_i * Ef1_i + Etf2_i * Etf2_i
        den = term if den is None else den + term
    err = (num * num) / jnp.maximum(den, _EPS)
    inl = jnp.where((err < thr) & (valid > 0.5), 1.0, 0.0)
    out_ref[...] = jnp.sum(inl, axis=1, keepdims=True).astype(jnp.int32)


def essential_counts_ref(E, f1, f2, valid, threshold):
    """XLA reference scoring (identical math; used on CPU). SoA
    bearings: f1, f2 (3, K)."""
    thr = float(threshold)
    Ef1 = jnp.einsum("hij,jk->hik", E, f1)
    Etf2 = jnp.einsum("hji,jk->hik", E, f2)
    num = jnp.sum(f2[None] * Ef1, axis=1)
    den = (Ef1[:, 0, :] ** 2 + Ef1[:, 1, :] ** 2
           + Etf2[:, 0, :] ** 2 + Etf2[:, 1, :] ** 2)
    err = (num * num) / jnp.maximum(den, _EPS)
    return jnp.sum((err < thr) & valid[None, :], axis=1).astype(jnp.int32)


def essential_counts(E: jnp.ndarray, f1: jnp.ndarray, f2: jnp.ndarray,
                     valid: jnp.ndarray, threshold: float,
                     interpret: bool = False) -> jnp.ndarray:
    """Sampson-inlier counts for essential-matrix hypotheses.

    E: (H, 3, 3); f1, f2: (3, K) SoA unit bearings; valid: (K,) bool.
    Returns (H,) int32.
    """
    thr = float(threshold)
    if not (_use_pallas() or interpret):
        return essential_counts_ref(E, f1, f2, valid, threshold)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = E.shape[0]
    E9 = _pad_h(E.reshape(H, 9))
    Hp = E9.shape[0]
    tile_h = _pick_tile(Hp)
    # g rows ordered to match vec(E): g[3i+j] = f2_i * f1_j — formed
    # directly from the SoA bearings, no transposes
    g = (f2[:, None, :] * f1[None, :, :]).reshape(9, -1)  # (9, K)
    vf = valid.astype(jnp.float32)[None, :]
    K = f1.shape[1]

    counts = pl.pallas_call(
        functools.partial(_essential_counts_kernel, thr=thr),
        grid=(Hp // tile_h,),
        in_specs=[
            pl.BlockSpec((tile_h, 9), lambda h: (h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, K), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, 1), lambda h: (h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, 1), jnp.int32),
        interpret=interpret,
    )(E9, g, f1, f2, vf)
    return counts[:H, 0]
