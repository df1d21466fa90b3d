"""Fixed-iteration batched RANSAC.

The verification hot kernel (SURVEY.md section 3.2: "the verifications/s
north-star kernel"). Replaces opengv's sequential RANSAC loops with a
fully-batched design: all `n_hyp` hypotheses are sampled deterministically
up front (counter-based, replicating the role of the reference's
`ransac_randomize: 0` + seeded engine, LcdParams.yaml:64-66), solved with
closed-form vmapped minimal solvers, and scored against all correspondences
at once. No early exit — fixed shapes, mask semantics, identical results
independent of batching or device count.

Reference envelope: <= 500 iterations, p = 0.995 (LcdParams.yaml:64-65);
acceptance thresholds mono >= 10, stereo >= 5 inliers (LcdParams.yaml:51-52).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from . import fivept, gather, minimal, score, soa

_EPS = 1e-12


def _masked_sample_parts(key, valid: jnp.ndarray, n_hyp: int, k: int):
    """Floyd k-subset sampling over the valid entries, split into
    (picks (n_hyp, k) int32 into the valid-first permutation,
     order (n,) int32 — the permutation itself,
     inv_order (n,) int32 — its inverse, computed ANALYTICALLY from the
     valid mask by cumulative counts, no second sort).

    Callers gather sample data through the fused permutation gather
    (gather.sample_gather_perm_t with inv_order) — materializing either
    `order[picks]` or `x[order]` was a measurable slice of verification
    time on TPU (the (n_hyp, k) int gather alone profiled at 3.3
    ms/batch in round 4).

    Floyd: draw t_j ~ U[0, m-k+j] for j = 0..k-1 over the valid count m;
    if t_j collides with an earlier pick, substitute m-k+j. O(k^2)
    compares — no per-hypothesis sort. Requires >= k valid entries; with
    fewer, index clamping yields repeats and downstream degeneracy masking
    rejects those hypotheses.
    """
    n = valid.shape[0]
    m = jnp.sum(valid).astype(jnp.int32)  # number of valid entries
    # positions of valid entries first, in original order (one stable sort)
    order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)
    # inverse permutation in closed form: a valid j ranks by the number
    # of valid entries at or before it; an invalid j ranks after all m
    # valid ones by its position among the invalid
    cv = jnp.cumsum(valid.astype(jnp.int32))
    cnv = jnp.cumsum((~valid).astype(jnp.int32))
    inv_order = jnp.where(valid, cv - 1, m + cnv - 1).astype(jnp.int32)
    u = jax.random.uniform(key, (n_hyp, k))
    picks = jnp.zeros((n_hyp, k), jnp.int32)
    for j in range(k):
        hi = jnp.maximum(m - k + 1 + j, 1)  # range size for draw j
        t = jnp.minimum((u[:, j] * hi.astype(u.dtype)).astype(jnp.int32),
                        hi - 1)
        # collision with any earlier pick -> substitute the new top index
        coll = jnp.zeros((n_hyp,), bool)
        for i in range(j):
            coll = coll | (picks[:, i] == t)
        t = jnp.where(coll, m - k + j, t)
        picks = picks.at[:, j].set(t)
    picks = jnp.clip(picks, 0, n - 1)
    return picks, order.astype(jnp.int32), inv_order


def _masked_sample(key, valid: jnp.ndarray, n_hyp: int, k: int) -> jnp.ndarray:
    """(n_hyp, k) distinct indices drawn only from valid positions
    (composed form of `_masked_sample_parts`)."""
    picks, order, _inv = _masked_sample_parts(key, valid, n_hyp, k)
    return order[picks].astype(jnp.int32)


def _distinct(picks: jnp.ndarray) -> jnp.ndarray:
    """(H,) bool — True where the sample has no repeated index."""
    srt = jnp.sort(picks, axis=1)
    return jnp.all(srt[:, 1:] != srt[:, :-1], axis=1)


def _gather_samples(data, picks):
    """data: (K, 3); picks: (H, k) indices. Returns list over the k sample
    points of SoA vec3s ((H,) components) via the one-hot MXU gather —
    no scalar gathers, no (H, k, 3) intermediate in a bad layout."""
    g = gather.sample_gather_t(data, picks)  # (k * 3, H)
    k = picks.shape[1]
    return [[g[m * 3 + i] for i in range(3)] for m in range(k)]


def _gather_samples_perm(data, picks, order, inv_order):
    """Fused-permutation variant of `_gather_samples`: gathers
    data[order[picks]] without materializing either index composition
    (gather.sample_gather_perm_t)."""
    g = gather.sample_gather_perm_t(data, picks, order, inv_order)
    k = picks.shape[1]
    return [[g[m * 3 + i] for i in range(3)] for m in range(k)]


def solve_arun_hyps(p, q, picks, order, inv_order):
    """SoA-batched minimal Arun solves for all hypotheses.

    p, q: (K, 3); picks: (H, 3) indices into the valid-first permutation
    `order` (inv_order its inverse — both from _masked_sample_parts).
    Returns (R_h (H, 3, 3), t_h (H, 3), ok_h (H,)) with ok_h False for
    degenerate or repeated samples. Shared by the single-chip and
    hypothesis-sharded (dist/sharded_verify.py) paths — per-hypothesis
    arithmetic is independent of the batch, so sharding the table cannot
    change results.
    """
    ps = _gather_samples_perm(p, picks, order, inv_order)
    qs = _gather_samples_perm(q, picks, order, inv_order)
    R_l, t_l, ok_h = soa.arun3(ps, qs)
    ok_h = ok_h & _distinct(picks)
    return soa.stack_mat3(R_l), soa.stack_vec(t_l), ok_h


def solve_essential_hyps(f1, f2, picks, order, inv_order):
    """SoA-batched 8-point essential solves for all hypotheses.

    f1, f2: (K, 3) unit bearings; picks: (H, 8). Returns
    (E_h (H, 3, 3), ok_h (H,)).
    """
    s1 = _gather_samples_perm(f1, picks, order, inv_order)
    s2 = _gather_samples_perm(f2, picks, order, inv_order)
    E_l, ok_h = soa.essential8(s1, s2)
    ok_h = ok_h & _distinct(picks)
    return soa.stack_mat3(E_l), ok_h


def ransac_arun(
    key,
    p: jnp.ndarray,
    q: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float = 0.3,
    n_hyp: int = 500,
    min_inliers: int = 5,
    refine: bool = True,
):
    """3d3d RANSAC with Arun minimal solver (k=3).

    p, q: (3, K) SoA corresponding 3D points (p in frame A, q in frame
    B) — coordinate-major: on TPU a trailing dim of 3 pads to a full
    128-lane tile (42x physical HBM bloat, measured as the dominant
    staging-copy cost of the verification batch), so every point array
    in the verification pipeline is coordinate-major.
    valid: (K,) mask. threshold: inlier distance in meters
    (`ransac_threshold_3d3d: 0.3`). Returns dict with R, t (B<-A ... the
    transform satisfying q ~ R p + t), inliers (K,), n_inliers, ok.
    """
    picks, order, inv_order = _masked_sample_parts(key, valid, n_hyp, 3)
    R_h, t_h, ok_h = solve_arun_hyps(p, q, picks, order, inv_order)

    # score: count of ||q - (R p + t)|| < threshold per hypothesis
    # (fused Pallas kernel on TPU — no (H, K) residual materialization)
    counts = score.rigid_counts(R_h, t_h, p, q, valid, threshold) * ok_h
    best = jnp.argmax(counts)
    R_b, t_b = R_h[best], t_h[best]

    def _inliers(R_b, t_b):
        resid = q - (R_b @ p + t_b[:, None])  # (3, K)
        return (jnp.sum(resid * resid, axis=0)
                < threshold * threshold) & valid

    best_inl = _inliers(R_b, t_b)
    if refine:
        # weighted re-solve on the consensus set (the reference's
        # optimize_3d3d_pose_from_inliers is off by default, but the
        # re-solve improves accuracy at negligible cost; inlier SET is
        # recomputed afterwards for reporting consistency)
        w = best_inl.astype(p.dtype)
        R_r, t_r, ok_r = minimal.arun_3d3d_soa(p, q, w)
        use = ok_r & (jnp.sum(best_inl) >= 3)
        R_b = jnp.where(use, R_r, R_b)
        t_b = jnp.where(use, t_r, t_b)
        best_inl = _inliers(R_b, t_b)
    n_inl = jnp.sum(best_inl).astype(jnp.int32)
    return {
        "R": R_b,
        "t": t_b,
        "inliers": best_inl,
        "n_inliers": n_inl,
        # gate on the REPORTED (post-refine) count so acceptance and the
        # logged inlier numbers are always consistent
        "ok": n_inl >= min_inliers,
    }


def ransac_translation_known_rotation(
    key,
    p: jnp.ndarray,
    q: jnp.ndarray,
    R_known: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float = 0.3,
    n_hyp: int = 200,
    min_inliers: int = 5,
):
    """1-point 3d3d RANSAC with known rotation (reference:
    `ransac_use_1point_3d3d: 1`, rotation from IMU/odometry;
    drawio:1787-1846). p, q: (3, K) SoA. Hypothesis: t = q_i - R p_i."""
    idx = _masked_sample(key, valid, n_hyp, 1)[:, 0]  # (H,)
    Rp = R_known @ p  # (3, K)
    diff = q - Rp  # (3, K)
    t_h = diff[:, idx].T  # (H, 3)
    d2 = sum((diff[i][None, :] - t_h[:, i:i + 1]) ** 2 for i in range(3))
    inl = (d2 < threshold * threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    best_inl = inl[best]
    # refine: mean translation over consensus
    w = best_inl.astype(p.dtype)[None, :]
    t_b = jnp.sum(diff * w, axis=1) / jnp.maximum(jnp.sum(w), 1.0)
    resid_b = diff - t_b[:, None]
    best_inl = (jnp.sum(resid_b * resid_b, axis=0)
                < threshold * threshold) & valid
    return {
        "R": R_known,
        "t": t_b,
        "inliers": best_inl,
        "n_inliers": jnp.sum(best_inl).astype(jnp.int32),
        "ok": counts[best] >= min_inliers,
    }


def ransac_pnp(
    key,
    X: jnp.ndarray,  # (K, 3) world points
    f: jnp.ndarray,  # (K, 3) camera-frame unit bearings
    valid: jnp.ndarray,
    threshold_px: float = 1.0,
    focal: float = 400.0,
    n_hyp: int = 500,
    min_inliers: int = 20,
    k_sample: int = 6,
):
    """2d3d RANSAC with the EPnP solver (reference: `use_pnp_tracking` /
    `pose_recovery_type: 1`, min_pnp_inliers 20, ransac_threshold_pnp 1 px;
    FrontendParams.yaml:84-88, LcdParams.yaml:53,57,74).

    The pixel threshold is converted to an angular one via the focal
    length (opengv does the same internally). Returns x_cam = R x_world + t.
    """
    ang_thresh = threshold_px / focal
    thr2 = ang_thresh * ang_thresh
    idx = _masked_sample(key, valid, n_hyp, k_sample)
    R_h, t_h, ok_h = minimal.epnp(X[idx], f[idx])
    err = minimal.bearing_reprojection_error(R_h, t_h, X[None], f[None])
    inl = (err < thr2) & valid[None, :]
    counts = jnp.sum(inl, axis=1) * ok_h
    best = jnp.argmax(counts)
    best_inl = inl[best]
    # refine on consensus
    R_r, t_r, ok_r = minimal.epnp(X, f, best_inl.astype(X.dtype))
    use = ok_r & (jnp.sum(best_inl) >= k_sample)
    R_b = jnp.where(use, R_r, R_h[best])
    t_b = jnp.where(use, t_r, t_h[best])
    err_b = minimal.bearing_reprojection_error(R_b, t_b, X, f)
    best_inl = (err_b < thr2) & valid
    n_inl = jnp.sum(best_inl).astype(jnp.int32)
    return {
        "R": R_b,
        "t": t_b,
        "inliers": best_inl,
        "n_inliers": n_inl,
        "ok": n_inl >= min_inliers,
    }


def ransac_essential_5pt(
    key,
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float = 1e-6,
    n_hyp: int = 200,
    min_inliers: int = 10,
    n_starts: int = 8,
    gn_iters: int = 8,
    preselect_pts: int = 64,
    preselect_models: int = 128,
    refine: bool = True,
):
    """2d2d monocular RANSAC with the true 5-point minimal solver
    (reference `ransac_2d2d_algorithm: 0/1` — Stewenius/Nister). Each
    minimal sample yields up to `n_starts` essential-matrix candidates
    (the solver's multiple roots); all are scored, as opengv does.

    Scoring is preemptive (Nister's preemptive RANSAC discipline, the
    standard batched-model variant): every (hypothesis, start) model is
    scored on the leading `preselect_pts` VALID correspondences IN THE
    KERNEL'S NATIVE LAYOUT (kernels/fivept.py presel_counts — the old
    path's model-table transpose alone cost 7.7 ms/batch on TPU), then
    each hypothesis's best start survives and the `preselect_models`
    best hypotheses are manifold-projected and scored on all K points.
    Preselect counts use the RAW polished models (converged roots
    already sit on the essential variety; non-converged wanderers lose
    either way); the winning model is projected and re-scored on all
    points, so the returned inlier set is exact for the model chosen.
    Set preselect_pts=0 (or preselect_models >= n_hyp) to score
    exhaustively.

    n_starts=8 / gn_iters=8 / preselect_models=128 defaults: S=8 exactly
    fills an f32 sublane tile in the fused kernel, and measured recall on
    the high-outlier fixture (tests/test_mono_5pt_parity.py) is unchanged
    from the original 10 starts x 16 iters x 256 survivors — the ~10-real-
    roots bound of the 5-pt problem makes extra starts redundant, GN
    converges quadratically, and the preselect counts on 64 points rank
    the true consensus model far above 128th (round-5 device profile: the
    256-survivor projection+rescore tail was ~9 ms of the 60 ms batch)."""
    picks, order, inv_order = _masked_sample_parts(key, valid, n_hyp, 5)
    H, S = n_hyp, n_starts
    # fused model generation: one-hot MXU sample gather feeding the
    # VMEM-resident nullspace+polish+projection kernel (kernels/fivept.py)
    # — the AoS f1[idx] gather + XLA-graph polish ran at 22.6 ms/batch on
    # TPU (round-4 breakdown), 2/3 of the mono stage. On CPU the same
    # call runs the algebraically identical XLA path, so the recall
    # fixtures (tests/test_mono_5pt_parity.py) gate the production
    # algebra on every backend.
    g1 = gather.sample_gather_perm_t(f1, picks, order, inv_order)  # (15, H)
    g2 = gather.sample_gather_perm_t(f2, picks, order, inv_order)
    E_rows = fivept.fivept_models(g1, g2, n_starts=n_starts,
                                  gn_iters=gn_iters, project=False)
    # fused Sampson-inlier counting (Pallas on TPU)
    K = f1.shape[1]
    if preselect_pts and H > preselect_models and K > 2 * preselect_pts:
        # preselect on the first `preselect_pts` VALID correspondences
        # (the stable valid-first permutation, so this subset is
        # all-valid whenever >= preselect_pts correspondences are valid —
        # a sparse or outlier-front-loaded valid mask can no longer tie
        # every model at zero and make top_k pick arbitrary survivors).
        # Selection is a one-hot matmul against inv_order — equivalent
        # to f[:, order[:P]] but with no argsort or lane-dim gather on
        # the traced path (both profiled as real costs on TPU)
        P = preselect_pts
        sel = (inv_order[:, None]
               == jnp.arange(P)[None, :]).astype(f1.dtype)  # (K, P)
        f1p = f1 @ sel
        f2p = f2 @ sel
        m_valid = jnp.sum(valid.astype(jnp.int32))
        validp = jnp.arange(P) < m_valid
        counts_hs = fivept.presel_counts(
            E_rows, f1p, f2p, validp, threshold, n_starts)
        E_sel_raw, _flat_idx = fivept.select_models(
            E_rows, counts_hs, preselect_models, n_starts)
        E_sel, _okp = minimal._project_essential(E_sel_raw)
        counts = score.essential_counts(E_sel, f1, f2, valid, threshold)
        E_b = E_sel[jnp.argmax(counts)]
    else:
        E_flat = fivept.models_to_flat(
            fivept._project_rows(E_rows, n_starts), n_starts)
        counts = score.essential_counts(E_flat, f1, f2, valid, threshold)
        E_b = E_flat[jnp.argmax(counts)]
    err0 = minimal.sampson_error_soa(E_b, f1, f2)
    best_inl = (err0 < threshold) & valid
    if refine:
        # refine on consensus with the (weighted) 8-point least squares
        E_r, ok_r = minimal.essential_8pt_soa(f1, f2,
                                              best_inl.astype(f1.dtype))
        use = ok_r & (jnp.sum(best_inl) >= 8)
        E_b = jnp.where(use, E_r, E_b)
        err_b = minimal.sampson_error_soa(E_b, f1, f2)
        best_inl = (err_b < threshold) & valid
    n_inl = jnp.sum(best_inl).astype(jnp.int32)
    return {
        "E": E_b,
        "inliers": best_inl,
        "n_inliers": n_inl,
        "ok": n_inl >= min_inliers,
    }


def ransac_essential(
    key,
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float = 1e-6,
    n_hyp: int = 500,
    min_inliers: int = 10,
    k_sample: int = 8,
):
    """2d2d monocular RANSAC: essential matrix from bearing vectors.

    f1, f2: (3, K) SoA unit bearings (coordinate-major — see
    ransac_arun's layout note). Role of the reference's
    `geometricVerificationNister` (mono RANSAC, >= 10 inliers gate,
    drawio:2589-2593). v1 uses the 8-point minimal solver (see
    kernels/minimal.py docstring for the 5-pt parity note).
    threshold: squared Sampson error (`ransac_threshold_2d2d: 1e-06`).
    """
    assert k_sample == 8, "the SoA minimal path is specialized to k=8"
    picks, order, inv_order = _masked_sample_parts(key, valid, n_hyp,
                                                    k_sample)
    E_h, ok_h = solve_essential_hyps(f1, f2, picks, order, inv_order)
    # fused Sampson-inlier counting (Pallas on TPU)
    counts = score.essential_counts(E_h, f1, f2, valid, threshold) * ok_h
    best = jnp.argmax(counts)
    E_best = E_h[best]
    err0 = minimal.sampson_error_soa(E_best, f1, f2)
    best_inl = (err0 < threshold) & valid
    # refine on consensus set (weighted 8-pt)
    E_r, ok_r = minimal.essential_8pt_soa(f1, f2,
                                          best_inl.astype(f1.dtype))
    use = ok_r & (jnp.sum(best_inl) >= k_sample)
    E_b = jnp.where(use, E_r, E_best)
    err_b = minimal.sampson_error_soa(E_b, f1, f2)
    best_inl = (err_b < threshold) & valid
    n_inl = jnp.sum(best_inl).astype(jnp.int32)
    return {
        "E": E_b,
        "inliers": best_inl,
        "n_inliers": n_inl,
        "ok": n_inl >= min_inliers,
    }
