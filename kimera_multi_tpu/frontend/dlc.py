"""Distributed loop-closure front-end orchestrator.

Role of `kimera_distributed`'s DistributedLoopClosure node (SURVEY.md
sections 2.1, 3.2): consumes per-robot keyframe streams (BoW + VLC
frames), detects inter-/intra-robot loop-closure candidates, verifies them
geometrically, and maintains the committed loop-closure set and the
keyframe pose graph for the back-end.

The reference's three threads (runDetection / runVerification / runComms,
drawio:243-257) and its request/response BoW & VLC traffic collapse into a
bulk-synchronous per-keyframe round: inside one process/pod all robots'
databases are directly addressable (the all-gather happened by
construction); the DCN request/response path for multi-pod deployments is
out of scope for this tier (SURVEY.md section 2.4).

The LCD status taxonomy of every attempted verification byte-matches the
reference's output_lcd_status.csv (evaluation/lc_result.py:146-155).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie, rng as rngmod
from ..core.containers import (
    EDGE_ODOMETRY,
    EDGE_PRIVATE_LC,
    EDGE_SHARED_LC,
    LCD_FAILED_GEOM_VERIFICATION,
    LCD_FAILED_POSE_RECOVERY,
    LCD_LOOP_DETECTED,
    PoseGraphEdges,
)
from ..kernels import bow as bow_kernel, hamming, ransac
from . import bow_db, lcd as lcd_mod, vocab as vocab_mod


class FrontendConfig(NamedTuple):
    lcd: lcd_mod.LcdParams = lcd_mod.LcdParams()
    bow_capacity: int = 128  # words per BoW vector
    lowe_ratio: float = 0.7
    ransac_hyp: int = 500
    mono_threshold: float = 1e-6
    stereo_threshold: float = 0.3
    min_mono_inliers: int = 10
    min_stereo_inliers: int = 5
    kappa_lc: float = 1e4
    tau_lc: float = 1e2
    kappa_odo: float = 1e4
    tau_odo: float = 1e2
    min_intra_separation: int = 10  # skip near-diagonal self matches
    # 5-pt minimal mono gate by default (reference parity:
    # ransac_2d2d_algorithm 0/1 = Stewenius/Nister 5-pt,
    # LcdParams.yaml:58; recall dominance over the 8-pt fallback at high
    # outlier ratios asserted by tests/test_mono_5pt_parity.py)
    use_5pt: bool = True
    base_seed: int = 0


class VerifiedLC(NamedTuple):
    robot_a: int
    frame_a: int
    robot_b: int
    frame_b: int
    R: np.ndarray  # T^a_b (pose of b's frame expressed in a)
    t: np.ndarray
    mono_inliers: int
    stereo_inliers: int
    bow_score: float
    status: int
    accepted: bool


def _jit_bow(vocab):
    @jax.jit
    def f(desc, valid, capacity_weights):
        words = vocab_mod.transform(vocab, desc, valid)
        return words

    return f


class DistributedFrontend:
    """Host-driven orchestrator over jitted stages. One instance per run
    (all robots — the single-master analogue)."""

    def __init__(self, n_robots: int, n_steps: int, vocab, cfg: FrontendConfig):
        self.cfg = cfg
        self.n_robots = n_robots
        self.n_steps = n_steps
        self.vocab = vocab
        W = cfg.bow_capacity
        self.dbs = [bow_db.empty(n_steps, W) for _ in range(n_robots)]
        self.bow_store = np.zeros((n_robots, n_steps, W), np.int64)
        self.prev_bow = [None] * n_robots  # for nss factor
        self.loops: list[VerifiedLC] = []
        self.lcd_attempts: list[VerifiedLC] = []
        self._transform = jax.jit(
            lambda d, v: vocab_mod.transform(self.vocab, d, v))
        self._bow_pack = jax.jit(
            lambda words: vocab_mod.bow_from_words(
                words, self.vocab.word_weights, W))
        self._sort = jax.jit(bow_kernel.sort_bow)
        self._self_score = jax.jit(bow_kernel.l1_scores)
        self._verify = self._build_verifier()
        self.bow_overflow = 0
        # temporal-constraint state per (query robot, target robot):
        # previous best-island representative + consecutive-consistency
        # counter (checkTemporalConstraint, drawio:1565) — identical
        # semantics to the batched scan (batched.py step carry)
        self.prev_island = np.full((n_robots, n_robots), -1, np.int32)
        self.consec = np.zeros((n_robots, n_robots), np.int32)

    def _build_verifier(self):
        cfg = self.cfg

        @jax.jit
        def verify(key, desc_q, valid_q, desc_m, valid_m, bear_q, bear_m,
                   lm_q, lm_m):
            m, _ = hamming.knn2_lowe_match(desc_q, valid_q, desc_m, valid_m,
                                           lowe_ratio=cfg.lowe_ratio)
            matched = m >= 0
            idx = jnp.maximum(m, 0)
            kmono = rngmod.derive(key, rngmod.Stream.RANSAC_MONO)
            mono_fn = (ransac.ransac_essential_5pt if cfg.use_5pt
                       else ransac.ransac_essential)
            # RANSAC engines take SoA (3, K) point arrays; this
            # sequential path keeps AoS stores (host-loop compat tier)
            # and converts at the boundary
            mono = mono_fn(
                kmono, bear_q.T, bear_m[idx].T, matched,
                threshold=cfg.mono_threshold, n_hyp=cfg.ransac_hyp,
                min_inliers=cfg.min_mono_inliers)
            kst = rngmod.derive(key, rngmod.Stream.RANSAC_STEREO)
            st = ransac.ransac_arun(
                kst, lm_q.T, lm_m[idx].T, matched,
                threshold=cfg.stereo_threshold, n_hyp=cfg.ransac_hyp,
                min_inliers=cfg.min_stereo_inliers)
            # Arun gives x_m = R x_q + t (T^m_q); the pose-graph edge
            # (src=q, dst=m) carries T^q_m = its inverse
            R_qm, t_qm = lie.se3_inverse(st["R"], st["t"])
            return {
                "mono_ok": mono["ok"],
                "stereo_ok": st["ok"],
                "mono_inliers": mono["n_inliers"],
                "stereo_inliers": st["n_inliers"],
                "R": R_qm,
                "t": t_qm,
            }

        return verify

    # ------------------------------------------------------------------
    def process_keyframe(self, robot: int, frame: int, descriptors,
                         bearings, landmarks, obs_valid) -> list[VerifiedLC]:
        """Full per-keyframe round for one robot: BoW -> detect -> verify.
        Returns newly committed loop closures (also appended internally)."""
        cfg = self.cfg
        desc = jnp.asarray(descriptors)
        v = jnp.asarray(obs_valid)
        words = self._transform(desc, v)
        ids, weights, ovf = self._bow_pack(words)
        self.bow_overflow += int(ovf)
        qs_ids, qs_w = self._sort(ids, weights)

        # nss factor: similarity to this robot's previous keyframe BoW
        if self.prev_bow[robot] is not None:
            p_ids, p_w = self.prev_bow[robot]
            nss = self._self_score(qs_ids, qs_w, p_ids[None], p_w[None],
                                   jnp.ones(1, bool))[0]
        else:
            nss = jnp.asarray(1.0)
        self.prev_bow[robot] = (ids, weights)

        new_loops: list[VerifiedLC] = []
        for target in range(self.n_robots):
            db = self.dbs[target]
            if target == robot:
                self_q = jnp.asarray(frame - cfg.min_intra_separation +
                                     cfg.lcd.recent_frames_window)
                # exclusion handled via recent_frames_window on own frame id
                res = lcd_mod.detect(db, qs_ids, qs_w, nss, cfg.lcd,
                                     self_query_frame=jnp.asarray(frame))
            else:
                res = lcd_mod.detect(db, qs_ids, qs_w, nss, cfg.lcd)
            # temporal constraint: mirror the batched scan exactly
            # (batched.py:123-132) — consecutive temporally-consistent best
            # islands required before a detection fires
            v0 = bool(res.detected)
            m0 = int(res.match_id)
            p = int(self.prev_island[robot, target])
            c = int(self.consec[robot, target])
            if cfg.lcd.min_temporal_matches > 1:
                close = p >= 0 and abs(m0 - p) <= \
                    cfg.lcd.max_nrFrames_between_islands
                c_new = (c + 1 if close else 1) if v0 else 0
                gate = v0 and c_new >= cfg.lcd.min_temporal_matches
            else:
                c_new = c + 1 if v0 else 0
                gate = v0
            self.prev_island[robot, target] = m0 if v0 else -1
            self.consec[robot, target] = c_new
            if not gate:
                continue
            match = m0
            lc = self._verify_pair(robot, frame, target, match,
                                   float(res.island_score),
                                   desc, v, bearings, landmarks)
            self.lcd_attempts.append(lc)
            if lc.accepted:
                self.loops.append(lc)
                new_loops.append(lc)

        # finally insert into own DB (after detection — the reference also
        # never matches a frame against itself)
        self.dbs[robot] = bow_db.add(self.dbs[robot], jnp.asarray(frame),
                                     ids, weights)
        self._store_obs(robot, frame, descriptors, bearings, landmarks,
                        obs_valid)
        return new_loops

    # observation cache (the VLC-frame store, drawio:2601)
    def _ensure_store(self, shape_desc, shape_pts):
        if not hasattr(self, "desc_store"):
            R, T = self.n_robots, self.n_steps
            K = shape_desc[0]
            self.desc_store = np.zeros((R, T, K, 32), np.uint8)
            self.bear_store = np.zeros((R, T, K, 3), np.float32)
            self.lm_store = np.zeros((R, T, K, 3), np.float32)
            self.obs_store = np.zeros((R, T, K), bool)

    def _store_obs(self, robot, frame, desc, bear, lm, valid):
        self._ensure_store(np.asarray(desc).shape, None)
        self.desc_store[robot, frame] = np.asarray(desc)
        self.bear_store[robot, frame] = np.asarray(bear)
        self.lm_store[robot, frame] = np.asarray(lm)
        self.obs_store[robot, frame] = np.asarray(valid)

    def _verify_pair(self, robot, frame, target, match, score,
                     desc, valid, bearings, landmarks) -> VerifiedLC:
        key = rngmod.derive(rngmod.base_key(self.cfg.base_seed),
                            robot, frame, target, match)
        out = self._verify(
            key, desc, valid,
            jnp.asarray(self.desc_store[target, match]),
            jnp.asarray(self.obs_store[target, match]),
            jnp.asarray(bearings),
            jnp.asarray(self.bear_store[target, match]),
            jnp.asarray(landmarks),
            jnp.asarray(self.lm_store[target, match]),
        )
        mono_ok = bool(out["mono_ok"])
        stereo_ok = bool(out["stereo_ok"])
        if not mono_ok:
            status = LCD_FAILED_GEOM_VERIFICATION
        elif not stereo_ok:
            status = LCD_FAILED_POSE_RECOVERY
        else:
            status = LCD_LOOP_DETECTED
        return VerifiedLC(
            robot_a=robot, frame_a=frame, robot_b=target, frame_b=match,
            R=np.asarray(out["R"]), t=np.asarray(out["t"]),
            mono_inliers=int(out["mono_inliers"]),
            stereo_inliers=int(out["stereo_inliers"]),
            bow_score=score, status=status,
            accepted=mono_ok and stereo_ok,
        )

    # ------------------------------------------------------------------
    def build_pose_graph(self, R_odo: np.ndarray, t_odo: np.ndarray,
                         edge_capacity: int | None = None) -> PoseGraphEdges:
        return build_pose_graph_from_loops(self.loops, R_odo, t_odo,
                                           self.cfg, edge_capacity)


def build_pose_graph_from_loops(
    loops, R_odo: np.ndarray, t_odo: np.ndarray, cfg: FrontendConfig,
    edge_capacity: int | None = None,
) -> PoseGraphEdges:
    """Assemble odometry + committed LC edges into the back-end's
    PoseGraphEdges (the request_pose_graph service equivalent,
    drawio:629-632)."""
    R, Tm1 = R_odo.shape[0], R_odo.shape[1]
    rows = []
    for r in range(R):
        for k in range(Tm1):
            rows.append((r, k, r, k + 1, R_odo[r, k], t_odo[r, k],
                         EDGE_ODOMETRY))
    for lc in loops:
        et = (EDGE_PRIVATE_LC if lc.robot_a == lc.robot_b
              else EDGE_SHARED_LC)
        rows.append((lc.robot_a, lc.frame_a, lc.robot_b, lc.frame_b,
                     lc.R, lc.t, et))
    E = len(rows)
    cap = edge_capacity or int(2 ** np.ceil(np.log2(max(E, 8))))
    Rm = np.broadcast_to(np.eye(3, dtype=np.float32),
                         (cap, 3, 3)).copy()
    tm = np.zeros((cap, 3), np.float32)
    cols = np.zeros((cap, 4), np.int32)
    et = np.zeros(cap, np.int32)
    kap = np.zeros(cap, np.float32)
    tau = np.zeros(cap, np.float32)
    for e, (sr, sp, dr, dp, Re, te, ety) in enumerate(rows):
        cols[e] = (sr, sp, dr, dp)
        Rm[e], tm[e] = Re, te
        et[e] = ety
        if ety == EDGE_ODOMETRY:
            kap[e], tau[e] = cfg.kappa_odo, cfg.tau_odo
        else:
            kap[e], tau[e] = cfg.kappa_lc, cfg.tau_lc
    return PoseGraphEdges(
        src_robot=jnp.asarray(cols[:, 0]),
        src_pose=jnp.asarray(cols[:, 1]),
        dst_robot=jnp.asarray(cols[:, 2]),
        dst_pose=jnp.asarray(cols[:, 3]),
        R=jnp.asarray(Rm),
        t=jnp.asarray(tm),
        kappa=jnp.asarray(kap),
        tau=jnp.asarray(tau),
        etype=jnp.asarray(et),
    )
