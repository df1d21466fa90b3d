"""Batched distributed loop-closure front-end.

The TPU-native replacement for the per-(robot, keyframe, target) host loop
of `frontend/dlc.py`: the reference's three front-end threads
(runDetection / runVerification / runComms, images/kimera-multi.drawio:
243-257) become two fully batched device stages with exactly one
host round-trip between them:

  stage 1 DETECT  one `lax.scan` over keyframe steps. Each step scores
                  every robot's query BoW against EVERY robot's database
                  in one batched L1-scoring call (the all-gather of BoW
                  traffic happened by construction), computes islands +
                  temporal gating, and emits up to `n_candidates` loop
                  candidates per (query robot, target robot)
                  (drawio:396,432-435; max_db_results, LcdParams.yaml:5).
  stage 2 VERIFY  ONE jitted call over the compacted candidate batch:
                  fused Pallas Hamming 2-NN + Lowe (kernels/hamming.py)
                  and vmapped mono-essential + 3d3d-Arun RANSAC
                  (drawio:2583-2599) — the same batched pipeline the
                  kernel benchmark measures, now the production path.

Candidate decisions and verification results are REPRODUCIBLY IDENTICAL
to the sequential `DistributedFrontend` host loop on a fixed seed (RNG is
keyed structurally by (robot, frame, target, match); insertion-order
effects are reproduced with per-pair frame bounds) — asserted by
tests/test_frontend_batched.py.

Temporal constraint (checkTemporalConstraint, drawio:1565): the scan
carries the previous best-island representative and a consecutive-
consistency counter per (query robot, target DB); detections fire only
after `min_temporal_matches` consecutive temporally-consistent matches
(LcdParams.yaml:13; pass-through when min_temporal_matches <= 1).
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie, rng as rngmod
from ..core.containers import (
    LCD_FAILED_GEOM_VERIFICATION,
    LCD_FAILED_POSE_RECOVERY,
    LCD_LOOP_DETECTED,
)
from ..kernels import bow as bow_kernel, gather, hamming, ransac
from . import lcd as lcd_mod, vocab as vocab_mod
from .dlc import FrontendConfig, VerifiedLC, build_pose_graph_from_loops


class DetectOutputs(NamedTuple):
    match: jnp.ndarray  # (T, R, R, C) int32 match frame, -1 if none
    score: jnp.ndarray  # (T, R, R, C) f32 island score
    detected: jnp.ndarray  # (T, R, R, C) bool
    nss: jnp.ndarray  # (T, R) f32 per-query nss factor


def make_detector(n_robots: int, n_steps: int, cfg: FrontendConfig,
                  n_candidates: int = 1, db_block: int | None = None):
    """Builds the jitted detection scan.

    Inputs at call time: per-frame packed BoW vectors for the whole run
    (ids/weights (R, T, W), sorted query copies, kf_valid (R, T)).

    Capacity discipline (campus envelope, VERDICT r3 item 5). Per scan
    step every query robot scores every target robot's database — compute
    is O(R^2 * T * W * log2 W) per step, O(R^2 * T^2 * W * log2 W) per
    run; this is the batched-dense equivalent of the reference's
    inverted-index sweep (`max_db_results` top-k over the whole DB,
    LcdParams.yaml:5) and is inherent to full-database loop search. What
    must NOT grow with T is the LIVE memory: the naive step materializes
    O(R^2 * T * W) searchsorted/hit/min intermediates (at 6 robots x
    6,000 kf x W=128 that is ~110 MB per intermediate, several live at
    once). `db_block` processes the target-frame axis in fixed-size
    blocks via `lax.map`, bounding live intermediates to
    O(R^2 * db_block * W) (~4.7 MB per intermediate at block 256)
    regardless of run length; the (R, T, W) BoW database itself is the
    only O(T) device residency (6 x 6,000 x 128 ids+weights = 37 MB).
    Default: auto — unblocked for T <= 512 (test/e2e scale, identical
    program to previous rounds), block 512 above. Blocking is a pure
    reorganization of the same arithmetic; scores are identical
    (tests/test_detect_scale.py asserts equality vs unblocked).
    """
    R, T = n_robots, n_steps
    params = cfg.lcd
    C = n_candidates
    window = params.recent_frames_window
    if db_block is None:
        db_block = T if T <= 512 else 512
    n_blocks = -(-T // db_block)
    Tp = n_blocks * db_block

    def step(carry, xs):
        (db_ids, db_w, db_valid, prev_ids, prev_w, prev_ok,
         prev_island, consec) = carry
        k, ids_k, w_k, qids_k, qw_k, kf_ok = xs

        # nss factor: similarity to this robot's previous keyframe BoW
        def nss_one(qi, qw, pi, pw, pok):
            s = bow_kernel.l1_scores(qi, qw, pi[None], pw[None],
                                     jnp.ones(1, bool))[0]
            return jnp.where(pok, s, 1.0)

        nss = jax.vmap(nss_one)(qids_k, qw_k, prev_ids, prev_w, prev_ok)

        # insert step-k BoWs BEFORE querying; per-pair frame bounds below
        # reproduce the sequential robot-order semantics (robot r's query
        # sees robot t<r's frame k, t>r only up to k-1)
        db_ids = db_ids.at[:, k].set(jnp.where(kf_ok[:, None], ids_k, -1))
        db_w = db_w.at[:, k].set(jnp.where(kf_ok[:, None], w_k, 0.0))
        db_valid = db_valid.at[:, k].set(kf_ok)

        rr = jnp.arange(R)
        bound = jnp.where(
            rr[:, None] > rr[None, :], k + 1,
            jnp.where(rr[:, None] < rr[None, :], k,
                      k - window + 1))  # (R query, R target)
        frame_idx = jnp.arange(T)

        def score_q_vs_t(qi, qw, ti, tw, tv, bnd):
            mask = tv & (frame_idx < bnd)
            if n_blocks == 1:
                return bow_kernel.l1_scores(qi, qw, ti, tw, mask)
            # blocked DB sweep: fixed-size chunks of the target-frame axis
            # keep live intermediates at O(db_block * W) per (query,
            # target) pair independent of T (see capacity note above)
            pad = Tp - T
            tib = jnp.pad(ti, ((0, pad), (0, 0)),
                          constant_values=-1).reshape(n_blocks, db_block, -1)
            twb = jnp.pad(tw, ((0, pad), (0, 0))).reshape(
                n_blocks, db_block, -1)
            mb = jnp.pad(mask, (0, pad)).reshape(n_blocks, db_block)
            out = jax.lax.map(
                lambda args: bow_kernel.l1_scores(qi, qw, *args),
                (tib, twb, mb))
            return out.reshape(Tp)[:T]

        # (R query, R target, T) raw L1 scores — one batched pass
        scores = jax.vmap(
            lambda qi, qw, bnds: jax.vmap(score_q_vs_t, in_axes=(None, None,
                                                                 0, 0, 0, 0))(
                qi, qw, db_ids, db_w, db_valid, bnds)
        )(qids_k, qw_k, bound)

        norm = lcd_mod.normalize_scores(scores, nss[:, None, None], params)
        m, s, v = jax.vmap(
            lambda ns: lcd_mod.top_islands(ns, params, C)
        )(norm.reshape(R * R, T))
        m = m.reshape(R, R, C)
        s = s.reshape(R, R, C)
        v = v.reshape(R, R, C)

        # temporal constraint on the best island per (query, target)
        m0, v0 = m[..., 0], v[..., 0]
        if params.min_temporal_matches > 1:
            close = (prev_island >= 0) & (
                jnp.abs(m0 - prev_island)
                <= params.max_nrFrames_between_islands)
            consec_new = jnp.where(v0, jnp.where(close, consec + 1, 1), 0)
            gate = v0 & (consec_new >= params.min_temporal_matches)
        else:
            consec_new = jnp.where(v0, consec + 1, 0)
            gate = v0
        prev_island_new = jnp.where(v0, m0, -1)

        det = v & gate[..., None] & kf_ok[:, None, None]

        # thread per-robot state only where this robot had a keyframe
        upd = kf_ok[:, None]
        prev_ids = jnp.where(upd, ids_k, prev_ids)
        prev_w = jnp.where(upd, w_k, prev_w)
        prev_ok = prev_ok | kf_ok
        prev_island = jnp.where(upd, prev_island_new, prev_island)
        consec = jnp.where(upd, consec_new, consec)

        carry = (db_ids, db_w, db_valid, prev_ids, prev_w, prev_ok,
                 prev_island, consec)
        return carry, (m, s, det, nss)

    W = cfg.bow_capacity

    @jax.jit
    def detect_all(ids, weights, qids, qweights, kf_valid):
        carry0 = (
            jnp.full((R, T, W), -1, jnp.int32),
            jnp.zeros((R, T, W), jnp.float32),
            jnp.zeros((R, T), bool),
            jnp.full((R, W), -1, jnp.int32),
            jnp.zeros((R, W), jnp.float32),
            jnp.zeros((R,), bool),
            jnp.full((R, R), -1, jnp.int32),
            jnp.zeros((R, R), jnp.int32),
        )
        xs = (jnp.arange(T), jnp.swapaxes(ids, 0, 1),
              jnp.swapaxes(weights, 0, 1), jnp.swapaxes(qids, 0, 1),
              jnp.swapaxes(qweights, 0, 1), jnp.swapaxes(kf_valid, 0, 1))
        carry, (m, s, det, nss) = jax.lax.scan(step, carry0, xs)
        db = carry[:3]
        return DetectOutputs(match=m, score=s, detected=det, nss=nss), db

    return detect_all


def make_verifier(cfg: FrontendConfig):
    """ONE jitted call verifying a padded candidate batch against the
    device-resident observation stores (the VLC-frame cache,
    drawio:2601). Matching runs in the fused Pallas pair kernel on TPU."""

    @jax.jit
    def verify_many(base_key, desc_store, obs_store, bear_store, lm_store,
                    qr, qf, tr, tm):
        """bear_store / lm_store are SoA: (R, T, 3, K) coordinate-major
        (a trailing dim of 3 pads to a 128-lane TPU tile — 42x physical
        HBM for the whole keyframe store AND every staged verify chunk)."""
        dq, vq = desc_store[qr, qf], obs_store[qr, qf]
        dm, vm = desc_store[tr, tm], obs_store[tr, tm]
        m, _ = hamming.knn2_lowe_match_pairs(dq, vq, dm, vm,
                                             lowe_ratio=cfg.lowe_ratio)

        keys = jax.vmap(
            lambda a, b, c, d: rngmod.derive(base_key, a, b, c, d)
        )(qr, qf, tr, tm)

        def one(key, mi, bq, bm, lq, lmm):
            matched = mi >= 0
            idx = jnp.maximum(mi, 0)
            kmono = rngmod.derive(key, rngmod.Stream.RANSAC_MONO)
            mono_fn = (ransac.ransac_essential_5pt if cfg.use_5pt
                       else ransac.ransac_essential)
            bm_m = gather.permute_cols(bm, idx)
            lm_m = gather.permute_cols(lmm, idx)
            mono = mono_fn(
                kmono, bq, bm_m, matched,
                threshold=cfg.mono_threshold, n_hyp=cfg.ransac_hyp,
                min_inliers=cfg.min_mono_inliers)
            kst = rngmod.derive(key, rngmod.Stream.RANSAC_STEREO)
            st = ransac.ransac_arun(
                kst, lq, lm_m, matched,
                threshold=cfg.stereo_threshold, n_hyp=cfg.ransac_hyp,
                min_inliers=cfg.min_stereo_inliers)
            R_qm, t_qm = lie.se3_inverse(st["R"], st["t"])
            return (mono["ok"], st["ok"], mono["n_inliers"],
                    st["n_inliers"], R_qm, t_qm)

        mono_ok, st_ok, n_mono, n_st, R_qm, t_qm = jax.vmap(one)(
            keys, m,
            bear_store[qr, qf], bear_store[tr, tm],
            lm_store[qr, qf], lm_store[tr, tm])
        return {"mono_ok": mono_ok, "stereo_ok": st_ok,
                "mono_inliers": n_mono, "stereo_inliers": n_st,
                "R": R_qm, "t": t_qm}

    return verify_many


class BatchedFrontend:
    """Drop-in batched counterpart of `dlc.DistributedFrontend` for whole
    recorded/simulated runs: same committed-loop and attempt records, two
    device dispatches instead of O(robots x steps x targets) host calls."""

    def __init__(self, n_robots: int, n_steps: int, vocab,
                 cfg: FrontendConfig, n_candidates: int = 1,
                 verify_chunk: int = 1024, db_block: int | None = None):
        self.cfg = cfg
        self.n_robots = n_robots
        self.n_steps = n_steps
        self.vocab = vocab
        self.n_candidates = n_candidates
        self.verify_chunk = verify_chunk
        self.loops: list[VerifiedLC] = []
        self.lcd_attempts: list[VerifiedLC] = []
        self.bow_overflow = 0
        self.stats: dict = {}
        self._detect = make_detector(n_robots, n_steps, cfg, n_candidates,
                                     db_block=db_block)
        self._verify = make_verifier(cfg)
        W = cfg.bow_capacity

        @jax.jit
        def bow_all(desc, valid):
            # (R, T, K, 32) -> packed BoW for every frame in one pass
            def per_frame(d, v):
                words = vocab_mod.transform(vocab, d, v)
                ids, weights, ovf = vocab_mod.bow_from_words(
                    words, vocab.word_weights, W)
                qi, qw = bow_kernel.sort_bow(ids, weights)
                return ids, weights, qi, qw, ovf

            f = jax.vmap(jax.vmap(per_frame))
            return f(desc, valid)

        self._bow_all = bow_all

    # ------------------------------------------------------------------
    def compute_bows(self, descriptors, obs_valid):
        """Packed BoW vectors for every frame (ids, weights, sorted query
        copies, overflow count) — the locally-computable half a DCN pod
        streams to its peers (only the pod's OWN robots' descriptors need
        to be present; other rows are ignored by the caller)."""
        ids, weights, qids, qw, ovf = self._bow_all(
            jnp.asarray(descriptors), jnp.asarray(obs_valid))
        return (np.asarray(ids), np.asarray(weights), np.asarray(qids),
                np.asarray(qw), int(np.asarray(ovf).sum()))

    def detect_candidates(self, descriptors=None, obs_valid=None,
                          query_robots=None, bows=None, kf_valid=None):
        """DETECT phase: BoW scoring scan + candidate compaction.

        Either pass raw `descriptors`/`obs_valid` (BoWs computed here —
        the single-process path) or precomputed `bows` = (ids, weights)
        (R, T, W) plus `kf_valid` (R, T) — the DCN-pod path, where remote
        robots' BoW vectors arrived over the wire (dist/dcn.py
        stream_bow_exchange) and raw descriptors are NOT available.

        Stores the compacted candidate list on self and returns
        (rr, kk, tt, mm): query robot, query frame, target robot, target
        frame arrays — the frames a verifier must hold VLC data for."""
        t0 = time.perf_counter()
        if bows is not None:
            ids, weights = (jnp.asarray(bows[0]), jnp.asarray(bows[1]))
            sq, sw = jax.vmap(jax.vmap(bow_kernel.sort_bow))(ids, weights)
            qids, qw = sq, sw
            kf_valid = np.asarray(kf_valid)
        else:
            desc = jnp.asarray(descriptors)
            ov = jnp.asarray(obs_valid)
            kf_valid = np.asarray(obs_valid).any(axis=-1)
            ids, weights, qids, qw, ovf = self._bow_all(desc, ov)
            self.bow_overflow = int(np.asarray(ovf).sum())
        out, _db = self._detect(ids, weights, qids, qw,
                                jnp.asarray(kf_valid))
        det = np.asarray(out.detected)
        match = np.asarray(out.match)
        score = np.asarray(out.score)
        t_detect = time.perf_counter() - t0

        # --- the single host round-trip: compact detected candidates in
        # the sequential path's (step, robot, target, candidate) order
        kk, rr, tt, cc = np.nonzero(det)
        if query_robots is not None:
            keep = np.isin(rr, np.asarray(sorted(query_robots)))
            kk, rr, tt, cc = kk[keep], rr[keep], tt[keep], cc[keep]
        order = np.lexsort((cc, tt, rr, kk))
        kk, rr, tt, cc = kk[order], rr[order], tt[order], cc[order]
        mm = match[kk, rr, tt, cc]
        ss = score[kk, rr, tt, cc]
        self._cand = (kk, rr, tt, mm, ss)
        self.stats.update(n_keyframes=int(kf_valid.sum()),
                          n_candidates=len(kk), t_detect=t_detect)
        return rr, kk, tt, mm

    def verify_candidates(self, descriptors, bearings, landmarks,
                          obs_valid):
        """VERIFY phase over the candidates from `detect_candidates`.
        The stores must hold VLC data for every candidate's query AND
        target frame (a DCN pod fetches missing target frames on demand
        first — dist/dcn.py vlc_request_exchange)."""
        kk, rr, tt, mm, ss = self._cand
        B = len(kk)
        if B == 0:
            self.stats.update(t_verify=0.0, verifications_per_s=0.0)
            return self.stats
        cfg = self.cfg
        desc = jnp.asarray(descriptors)
        # one run-level relayout to the SoA keyframe stores (R, T, 3, K)
        bear = jnp.swapaxes(jnp.asarray(bearings), -1, -2)
        lm = jnp.swapaxes(jnp.asarray(landmarks), -1, -2)
        ov = jnp.asarray(obs_valid)

        # Verify in FIXED-SIZE chunks (capacity discipline, SURVEY §7.4):
        # bounds the live (chunk, K) match/score intermediates regardless
        # of how many candidates a run produces, and keeps ONE compiled
        # verify program for every run length (the old next-pow2 padding
        # recompiled per distinct candidate count). The observation
        # stores stay device-resident across chunks — at the campus
        # envelope (6 robots x 6000 kf x 300 feats) they are ~3.3 GB of
        # uint8 descriptors + ~2.6 GB f32 bearings/landmarks, well inside
        # one chip's HBM; the per-chunk working set is ~chunk x K
        # gathered rows, a few hundred MB at chunk=1024.
        chunk = min(self.verify_chunk, max(
            64, int(2 ** np.ceil(np.log2(B)))))
        n_chunks = (B + chunk - 1) // chunk
        t1 = time.perf_counter()
        res_parts = []
        for ci in range(n_chunks):
            lo = ci * chunk
            sl = slice(lo, min(lo + chunk, B))
            pad = chunk - (sl.stop - sl.start)

            def padded(a):
                return jnp.asarray(np.concatenate(
                    [a[sl], np.zeros(pad, a.dtype)]))

            part = self._verify(rngmod.base_key(cfg.base_seed),
                                desc, ov, bear, lm,
                                padded(rr), padded(kk), padded(tt),
                                padded(mm))
            res_parts.append(jax.tree_util.tree_map(
                lambda a: np.asarray(a)[: sl.stop - sl.start], part))
        res = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs), *res_parts)
        t_verify = time.perf_counter() - t1
        self.stats.update(
            t_verify=t_verify, verify_chunks=n_chunks,
            verify_chunk_size=chunk,
            verifications_per_s=(n_chunks * chunk) / max(t_verify, 1e-9))

        for i in range(B):
            mono_ok = bool(res["mono_ok"][i])
            stereo_ok = bool(res["stereo_ok"][i])
            if not mono_ok:
                status = LCD_FAILED_GEOM_VERIFICATION
            elif not stereo_ok:
                status = LCD_FAILED_POSE_RECOVERY
            else:
                status = LCD_LOOP_DETECTED
            lc = VerifiedLC(
                robot_a=int(rr[i]), frame_a=int(kk[i]),
                robot_b=int(tt[i]), frame_b=int(mm[i]),
                R=res["R"][i], t=res["t"][i],
                mono_inliers=int(res["mono_inliers"][i]),
                stereo_inliers=int(res["stereo_inliers"][i]),
                bow_score=float(ss[i]), status=status,
                accepted=mono_ok and stereo_ok)
            self.lcd_attempts.append(lc)
            if lc.accepted:
                self.loops.append(lc)
        return self.stats

    def process_all(self, descriptors, bearings, landmarks, obs_valid,
                    query_robots=None):
        """Run the full front-end over a recorded/simulated run:
        `detect_candidates` + `verify_candidates` back to back (the
        single-process path, where all VLC data is already local).

        descriptors (R, T, K, 32) uint8; bearings/landmarks (R, T, K, 3);
        obs_valid (R, T, K). Populates self.loops / self.lcd_attempts in
        the sequential path's iteration order; returns timing stats.

        query_robots: optional iterable of robot ids — verify only
        candidates whose QUERY robot is in the set. This is how a DCN pod
        partitions verification work: each pod verifies its own robots'
        detections against the fleet-wide database (the reference's
        per-robot verification thread does the same), and the other pods'
        committed loops arrive as edges over the wire (cli/pod.py)."""
        self.detect_candidates(descriptors, obs_valid,
                               query_robots=query_robots)
        return self.verify_candidates(descriptors, bearings, landmarks,
                                      obs_valid)

    def build_pose_graph(self, R_odo, t_odo, edge_capacity=None):
        return build_pose_graph_from_loops(
            self.loops, R_odo, t_odo, self.cfg, edge_capacity)
