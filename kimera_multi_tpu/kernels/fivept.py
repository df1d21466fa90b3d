"""Fused five-point model generation (Pallas on TPU, XLA SoA elsewhere).

The mono-RANSAC model generator — nullspace extraction + multi-start GN
polish + essential-manifold projection — is pure lane-parallel elementwise
math (~700 FLOP x gn_iters per (hypothesis, start) lane), but as an XLA
graph it runs as hundreds of small fused elementwise ops whose
intermediates round-trip HBM every GN iteration: measured 22.6 ms for the
nullspace+polish slice of the 128 x 500-hypothesis bench batch (round-4
breakdown), dominating the mono stage that VERDICT r3 item 3 requires
back under budget.

This kernel performs the whole chain per hypothesis tile inside VMEM:

  input   (15, H) SoA sample bearings per side (5 points x xyz,
          hypothesis-minor — the layout `gather.sample_gather_t` emits)
  step 1  epipolar design rows r_j = outer(f2_j, f1_j) (5 x 9, in lanes)
  step 2  right-nullspace basis via 5 unrolled Householder reflections
          (exact port of linalg.nullspace_qr, lane-major)
  step 3  multi-start GN polish on the essential variety — the start
          axis rides the SUBLANE dimension ((S, TILE_H) arrays, so
          S = 8 exactly fills an f32 tile row) reusing
          soa.essential5_polish_soa verbatim (same algebra as the XLA
          path, analytic Jacobian, gauge projection, step cap)
  output  (9 S, H) raw models, entry-major rows; the essential-manifold
          projection (soa.project_essential_soa) runs as one XLA
          elementwise pass outside the kernel — its analytic eigh needs
          acos, which Mosaic does not lower, and it is a single pass vs
          the iterated polish

Nothing but the 15-float samples and the 9 S model entries touch HBM.

Role of opengv's Nister/Stewenius 5-pt solve inside its RANSAC loop
(reference `ransac_2d2d_algorithm: 0/1`, params/D455/LcdParams.yaml:73,
FrontendParams.yaml:78); the multi-start-GN deviation is documented at
kernels/minimal.py:essential_5pt and COMPONENTS.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import soa

_EPS = 1e-12
_TILE_H = 128

# deterministic multi-start directions (coefficients of the nullspace
# combination) — MUST stay identical to minimal._FIVEPT_STARTS so the
# Pallas and XLA paths solve the same problem from the same starts
_STARTS = np.asarray(
    [
        [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1],
        [1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1], [1, -1, -1, 1],
        [2, 1, 0, -1], [-1, 2, 1, 0], [0, -1, 2, 1], [1, 0, -1, 2],
        [1, 2, -2, 1], [-2, 1, 1, 2], [1, -2, 1, 2], [2, 2, 1, -1],
    ],
    np.float32,
)
_STARTS = _STARTS / np.linalg.norm(_STARTS, axis=1, keepdims=True)


def _use_pallas() -> bool:
    from ..core.backend import is_tpu

    return is_tpu()


def _nullspace_rows5_soa(rows):
    """Right-nullspace basis of the 5 x 9 design, lane-major.

    rows: list of 5 lists of 9 entries (each (1, TH)). Exact port of
    linalg.nullspace_qr (k=5, n=9): 5 unrolled Householder reflections on
    A = rows^T, then back-application onto e_5..e_8. Returns
    basis[s][i] (s in 0..3, i in 0..8), entries (1, TH).
    """
    n, k = 9, 5
    # A[i][j] = rows[j][i]
    A = [[rows[j][i] for j in range(k)] for i in range(n)]
    vs = []
    for j in range(k):
        # x = A[:, j], masked below the pivot
        xj = [A[i][j] if i >= j else None for i in range(n)]
        alpha2 = sum(xj[i] * xj[i] for i in range(j, n))
        alpha = jnp.sqrt(jnp.maximum(alpha2, _EPS))
        sign = jnp.where(A[j][j] >= 0, 1.0, -1.0)
        v = [None] * n
        for i in range(j, n):
            v[i] = xj[i] + (sign * alpha if i == j else 0.0)
        vn = jnp.sqrt(jnp.maximum(
            sum(v[i] * v[i] for i in range(j, n)), _EPS))
        inv = 1.0 / vn
        for i in range(j, n):
            v[i] = v[i] * inv
        vs.append((j, v))
        # A -= 2 v (v^T A)
        for c in range(k):
            coef = 2.0 * sum(v[i] * A[i][c] for i in range(j, n))
            for i in range(j, n):
                A[i][c] = A[i][c] - v[i] * coef
    zero = jnp.zeros_like(rows[0][0])
    one = jnp.ones_like(rows[0][0])
    basis = []
    for col in range(k, n):
        # q = e_col, back-apply reflections in reverse order; a
        # reflection with pivot j only touches entries i >= j
        q = [zero] * n
        q[col] = one
        for j, v in reversed(vs):
            dot = sum(v[i] * q[i] for i in range(j, n))
            for i in range(j, n):
                q[i] = q[i] - 2.0 * v[i] * dot
        basis.append(q)
    return basis


def _fivept_kernel(f1_ref, f2_ref, out_ref, *, n_starts: int,
                   gn_iters: int):
    f1 = f1_ref[...]  # (15, TH)
    f2 = f2_ref[...]
    TH = f1.shape[1]
    # design rows: row_j = outer(f2_j, f1_j).ravel()  (entry i = 3 r + c)
    rows = [[f2[3 * j + r:3 * j + r + 1, :] * f1[3 * j + c:3 * j + c + 1, :]
             for r in range(3) for c in range(3)]
            for j in range(5)]
    basis = _nullspace_rows5_soa(rows)  # [s][i] (1, TH)
    B9 = [basis[s] for s in range(4)]

    # initial starts ride the sublane axis: q0[comp] (S, TH) — built from
    # Python scalar literals (Pallas kernels cannot capture array consts)
    q0 = [
        jnp.concatenate(
            [jnp.full((1, TH), float(v), jnp.float32)
             for v in _STARTS[:n_starts, comp]], axis=0)
        for comp in range(4)
    ]
    q = soa.essential5_polish_soa(B9, q0, n_iters=gn_iters)
    E9 = [q[0] * B9[0][i] + q[1] * B9[1][i] + q[2] * B9[2][i]
          + q[3] * B9[3][i] for i in range(9)]  # (S, TH) each
    # manifold projection happens OUTSIDE the kernel: its analytic eigh
    # needs acos, which Mosaic TPU does not lower; the projection is a
    # single cheap elementwise pass vs the iterated polish
    for e in range(9):
        out_ref[e * n_starts:(e + 1) * n_starts, :] = E9[e]


def fivept_models(f1s: jnp.ndarray, f2s: jnp.ndarray, n_starts: int = 8,
                  gn_iters: int = 12, interpret: bool = False,
                  project: bool = True) -> jnp.ndarray:
    """Essential models from SoA minimal samples.

    f1s, f2s: (15, H) — 5 sample bearings per hypothesis, component-major
    (sample_gather_t layout: row 3 j + d is coordinate d of sample j).
    Returns (9 * n_starts, H): row e * n_starts + s is entry
    (e // 3, e % 3) of the s-th start's model — manifold-projected when
    `project` is True, raw polished combinations otherwise (the
    preselect path scores raw models and projects only the survivors;
    converged roots already sit on the essential variety, so the raw
    scores differ only for non-converged wanderers that lose either way).

    On TPU this is the fused VMEM kernel; elsewhere an algebraically
    identical XLA path (the same soa.* routines on the same layout).
    """
    H = f1s.shape[1]
    if not (_use_pallas() or interpret):
        return _fivept_models_ref(f1s, f2s, n_starts, gn_iters,
                                  project=project)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # bigger hypothesis tiles = fewer grid steps (the polish working set
    # is ~50 live (S, tile) arrays — well under VMEM even at 512 lanes)
    tile = 512 if H > 256 else _TILE_H
    pad = (-H) % tile
    if pad:
        f1s = jnp.pad(f1s, ((0, 0), (0, pad)))
        f2s = jnp.pad(f2s, ((0, 0), (0, pad)))
    Hp = H + pad
    out = pl.pallas_call(
        functools.partial(_fivept_kernel, n_starts=n_starts,
                          gn_iters=gn_iters),
        grid=(Hp // tile,),
        in_specs=[
            pl.BlockSpec((15, tile), lambda h: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((15, tile), lambda h: (0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * n_starts, tile), lambda h: (0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * n_starts, Hp), jnp.float32),
        interpret=interpret,
    )(f1s.astype(jnp.float32), f2s.astype(jnp.float32))
    out = out[:, :H]
    return _project_rows(out, n_starts) if project else out


def _project_rows(E_rows: jnp.ndarray, n_starts: int) -> jnp.ndarray:
    """Essential-manifold projection of (9 S, H) raw model rows (XLA:
    the analytic eigh needs acos, unavailable in Mosaic)."""
    S = n_starts
    E9 = [E_rows[e * S:(e + 1) * S] for e in range(9)]
    Eproj, _ok = soa.project_essential_soa(E9)
    return jnp.concatenate([Eproj[e // 3][e % 3] for e in range(9)],
                           axis=0)


def _fivept_models_ref(f1s, f2s, n_starts, gn_iters, project: bool = True):
    """XLA reference path on the identical SoA layout/algebra."""
    rows = [[f2s[3 * j + r] * f1s[3 * j + c]
             for r in range(3) for c in range(3)]
            for j in range(5)]
    rows2 = [[r[None, :] for r in rj] for rj in rows]
    basis = _nullspace_rows5_soa(rows2)
    B9 = [basis[s] for s in range(4)]
    H = f1s.shape[1]
    q0 = [
        jnp.broadcast_to(
            jnp.asarray(_STARTS[:n_starts, comp]).reshape(n_starts, 1),
            (n_starts, H))
        for comp in range(4)
    ]
    q = soa.essential5_polish_soa(B9, q0, n_iters=gn_iters)
    E9 = [q[0] * B9[0][i] + q[1] * B9[1][i] + q[2] * B9[2][i]
          + q[3] * B9[3][i] for i in range(9)]
    out = jnp.concatenate(E9, axis=0)
    return _project_rows(out, n_starts) if project else out


def _presel_counts_kernel(E_ref, g_ref, f1s_ref, f2s_ref, vm_ref, out_ref,
                          *, thr: float):
    """Sampson-inlier counts over the preselect points for one lane tile
    of the FLATTENED (start x hypothesis) model axis.

    The caller merges the start axis into lanes with a free XLA reshape
    of the (9 S, H) model rows (rows are entry-major, so
    (9 S, H) -> (9, S H) moves no data), so ALL models in a tile score
    in SIX MXU contractions. The previous per-start loop issued
    6 S = 48 thin matmuls per tile (contraction dims 3/9); Mosaic's
    per-dot overhead made it the #2 op of the round-5 device profile at
    8.4 ms/batch. Intermediates are (P, TL)."""
    E = E_ref[...]        # (9, TL): column s*H+h is model (h, s)
    g = g_ref[...]        # (9, P): g[3i+j, p] = f2[i, p] * f1[j, p]
    f1s = f1s_ref[...]    # (3, P) SoA
    f2s = f2s_ref[...]    # (3, P)
    vm = vm_ref[...]      # (1, P) f32 valid mask
    num = jax.lax.dot_general(
        g, E, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (P, TL)
    den = None
    for i in range(2):
        Ei = E[3 * i:3 * i + 3, :]  # (3, TL) row i of E
        Eti = jnp.concatenate(
            [E[c * 3 + i:c * 3 + i + 1, :] for c in range(3)],
            axis=0)  # (3, TL) row i of E^T
        a = jax.lax.dot_general(
            f1s, Ei, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        b = jax.lax.dot_general(
            f2s, Eti, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        t = a * a + b * b
        den = t if den is None else den + t
    err = (num * num) / jnp.maximum(den, _EPS)
    inl = jnp.where(err < thr, 1.0, 0.0)  # (P, TL)
    cnt = jax.lax.dot_general(
        vm, inl, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (1, TL)
    out_ref[...] = cnt.astype(jnp.int32)


def presel_counts(E_rows: jnp.ndarray, f1p: jnp.ndarray, f2p: jnp.ndarray,
                  validp: jnp.ndarray, threshold: float, n_starts: int,
                  interpret: bool = False) -> jnp.ndarray:
    """Preselect Sampson-inlier counts for every (hypothesis, start).

    E_rows: (9 S, H) raw model rows (fivept_models project=False layout);
    f1p, f2p: (3, P) SoA preselect bearings; validp: (P,) mask.
    Returns (H, S) int32 counts. TPU: fused kernel on the native layout
    (the old path's models_to_flat transpose alone cost 7.7 ms/batch);
    elsewhere: the reference scoring on the flattened models.
    """
    S = n_starts
    H = E_rows.shape[1]
    thr = float(threshold)
    if not (_use_pallas() or interpret):
        from . import score

        flat = models_to_flat(E_rows, S)  # (H S, 3, 3) h-major
        c = score.essential_counts_ref(flat, f1p, f2p, validp, thr)
        return c.reshape(H, S)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # free relayout: rows are entry-major (row e*S + s), so the start
    # axis merges into lanes without moving data; column s*H + h of
    # E_all is model (hypothesis h, start s)
    E_all = E_rows.reshape(9, S * H)
    L = S * H
    tile = min(4096, -(-L // 512) * 512)
    pad = (-L) % tile
    if pad:
        E_all = jnp.pad(E_all, ((0, 0), (0, pad)))
    Lp = L + pad
    P = f1p.shape[1]
    g = (f2p[:, None, :] * f1p[None, :, :]).reshape(9, P)
    vm = validp.astype(jnp.float32)[None, :]
    out = pl.pallas_call(
        functools.partial(_presel_counts_kernel, thr=thr),
        grid=(Lp // tile,),
        in_specs=[
            pl.BlockSpec((9, tile), lambda h: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, P), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, P), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, P), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda h: (0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Lp), jnp.int32),
        interpret=interpret,
    )(E_all.astype(jnp.float32), g.astype(jnp.float32),
      f1p.astype(jnp.float32), f2p.astype(jnp.float32), vm)
    return out[0, :L].reshape(S, H).T


def select_models(E_rows: jnp.ndarray, counts: jnp.ndarray, n_keep: int,
                  n_starts: int):
    """Per-hypothesis-best preemptive selection.

    counts: (H, S) preselect counts. Keeps each hypothesis's best start,
    then the `n_keep` best hypotheses. Returns (E_sel (n_keep, 3, 3) RAW
    models, flat_idx (n_keep,) into the h-major (H S) model table)."""
    S = n_starts
    best_s = jnp.argmax(counts, axis=1)          # (H,)
    best_c = jnp.max(counts, axis=1)
    _, top_h = jax.lax.top_k(best_c, n_keep)
    s_sel = best_s[top_h]
    cols = E_rows[:, top_h]                      # (9 S, n_keep)
    ent = jnp.take_along_axis(
        cols.reshape(9, S, n_keep), s_sel[None, None, :], axis=1
    )[:, 0, :]                                   # (9, n_keep)
    E_sel = ent.T.reshape(n_keep, 3, 3)
    return E_sel, top_h * S + s_sel


def models_to_flat(E_rows: jnp.ndarray, n_starts: int) -> jnp.ndarray:
    """(9 S, H) kernel output -> (H * S, 3, 3) model table in the
    (hypothesis-major, start-minor) order RANSAC scoring flattens to."""
    S = n_starts
    H = E_rows.shape[1]
    return (E_rows.reshape(3, 3, S, H)
            .transpose(3, 2, 0, 1)
            .reshape(H * S, 3, 3))
