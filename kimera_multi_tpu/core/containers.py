"""Typed pytree schemas — the framework's message/state vocabulary.

Replaces the reference's ROS message definitions (`pose_graph_tools` msgs
PoseGraph/PoseGraphEdge/BowQuery/VLCFrame, SURVEY.md section 2.1) with
fixed-shape, padded struct-of-arrays pytrees that shard cleanly over device
meshes and serialize for DCN transport / on-disk logs.

Every container with variable logical length carries a `valid` mask (and/or
`count`); capacities are static shape parameters. Overflow must be handled by
the producer (counted, never silently dropped) — SURVEY.md section 7.4.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

# Edge-type codes for PoseGraphEdges.etype — mirrors dpgo's measurement
# routing (addOdometry / addPrivateLoopClosure / addSharedLoopClosure,
# images/kimera-multi.drawio:2790-2826).
EDGE_INVALID = 0
EDGE_ODOMETRY = 1
EDGE_PRIVATE_LC = 2
EDGE_SHARED_LC = 3


@flax.struct.dataclass
class PoseGraphEdges:
    """Struct-of-arrays pose graph measurements, capacity E.

    Node addressing is (robot, local_index); helpers below flatten to global
    indices given per-robot capacity.
    """

    src_robot: jnp.ndarray  # (E,) int32
    src_pose: jnp.ndarray  # (E,) int32
    dst_robot: jnp.ndarray  # (E,) int32
    dst_pose: jnp.ndarray  # (E,) int32
    R: jnp.ndarray  # (E, 3, 3) measured relative rotation
    t: jnp.ndarray  # (E, 3) measured relative translation
    kappa: jnp.ndarray  # (E,) rotation concentration (1/sigma_R^2 style)
    tau: jnp.ndarray  # (E,) translation precision
    etype: jnp.ndarray  # (E,) int32, EDGE_* codes; EDGE_INVALID = padding

    @property
    def capacity(self) -> int:
        return self.src_robot.shape[0]

    @property
    def valid(self) -> jnp.ndarray:
        return self.etype != EDGE_INVALID

    def global_ids(self, poses_per_robot: int):
        src = self.src_robot * poses_per_robot + self.src_pose
        dst = self.dst_robot * poses_per_robot + self.dst_pose
        return src, dst

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "PoseGraphEdges":
        zi = jnp.zeros((capacity,), jnp.int32)
        return PoseGraphEdges(
            src_robot=zi,
            src_pose=zi,
            dst_robot=zi,
            dst_pose=zi,
            R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (capacity, 3, 3)),
            t=jnp.zeros((capacity, 3), dtype),
            kappa=jnp.zeros((capacity,), dtype),
            tau=jnp.zeros((capacity,), dtype),
            etype=zi,
        )


def concat_edges(batches, capacity: int | None = None) -> PoseGraphEdges:
    """Merge edge batches (e.g. per-pod sets exchanged over DCN) into one
    capacity-padded graph. Only valid rows of each batch are kept; padding
    rows carry EDGE_INVALID. Deterministic: batches are concatenated in the
    order given, so callers exchanging over DCN must order by sender rank."""
    import numpy as np

    cols = {f: [] for f in ("src_robot", "src_pose", "dst_robot",
                            "dst_pose", "R", "t", "kappa", "tau", "etype")}
    for b in batches:
        keep = np.asarray(b.valid)
        for f in cols:
            cols[f].append(np.asarray(getattr(b, f))[keep])
    cat = {f: np.concatenate(v) if v else np.zeros((0,)) for f, v in
           cols.items()}
    E = len(cat["etype"])
    cap = capacity or int(2 ** np.ceil(np.log2(max(E, 8))))
    if E > cap:
        raise ValueError(f"{E} edges exceed capacity {cap}")
    out = PoseGraphEdges.empty(cap)
    pad = cap - E
    import jax.numpy as jnp

    def fill(name, empty_val):
        v = cat[name]
        tail = np.broadcast_to(empty_val, (pad,) + v.shape[1:])
        return jnp.asarray(np.concatenate([v, tail]).astype(
            np.asarray(getattr(out, name)).dtype))

    return PoseGraphEdges(
        src_robot=fill("src_robot", 0), src_pose=fill("src_pose", 0),
        dst_robot=fill("dst_robot", 0), dst_pose=fill("dst_pose", 0),
        R=fill("R", np.eye(3, dtype=np.float32)), t=fill("t", 0.0),
        kappa=fill("kappa", 0.0), tau=fill("tau", 0.0),
        etype=fill("etype", 0))


@flax.struct.dataclass
class BowVector:
    """Padded sparse Bag-of-Words vector (reference: DBoW2 BowVector,
    L1-normalized; SURVEY.md section 2.1 dbow2_catkin row)."""

    word_ids: jnp.ndarray  # (W,) int32, -1 = padding
    weights: jnp.ndarray  # (W,) float32, L1-normalized over valid entries

    @property
    def valid(self) -> jnp.ndarray:
        return self.word_ids >= 0


@flax.struct.dataclass
class VlcFrame:
    """Visual loop-closure frame: keypoints + descriptors for geometric
    verification (reference msg VLCFrame; kimera_multi_lcd::addVLCFrame,
    images/kimera-multi.drawio:2601)."""

    bearings: jnp.ndarray  # (K, 3) unit bearing vectors (mono verification)
    landmarks: jnp.ndarray  # (K, 3) 3D points in camera frame (stereo/3d3d)
    descriptors: jnp.ndarray  # (K, 32) uint8 packed ORB
    valid: jnp.ndarray  # (K,) bool
    has_depth: jnp.ndarray  # (K,) bool — landmark column is meaningful


@flax.struct.dataclass
class LoopCandidate:
    """Candidate inter-/intra-robot loop closures awaiting verification
    (reference: candidate_lc_ / queue_lc_, drawio:287-292,432-435)."""

    robot_a: jnp.ndarray  # (C,) int32
    frame_a: jnp.ndarray  # (C,) int32
    robot_b: jnp.ndarray  # (C,) int32
    frame_b: jnp.ndarray  # (C,) int32
    bow_score: jnp.ndarray  # (C,) float32 (normalized nss score)
    valid: jnp.ndarray  # (C,) bool


# Loop-closure verification status taxonomy — byte-matches the reference's
# output_lcd_status.csv values (evaluation/lc_result.py:146-155).
LCD_LOOP_DETECTED = 0
LCD_FAILED_TEMPORAL_CONSTRAINT = 1
LCD_FAILED_GEOM_VERIFICATION = 2
LCD_FAILED_POSE_RECOVERY = 3
LCD_NO_MATCHES = 4
LCD_STATUS_NAMES = {
    LCD_LOOP_DETECTED: "LOOP_DETECTED",
    LCD_FAILED_TEMPORAL_CONSTRAINT: "FAILED_TEMPORAL_CONSTRAINT",
    LCD_FAILED_GEOM_VERIFICATION: "FAILED_GEOM_VERIFICATION",
    LCD_FAILED_POSE_RECOVERY: "FAILED_POSE_RECOVERY",
    LCD_NO_MATCHES: "NO_MATCHES",
}


@flax.struct.dataclass
class VerifiedLoop:
    """Output of geometric verification, one row per candidate.

    Columns mirror the reference's loop_closures.csv contract
    (`robot1,pose1,robot2,pose2,qx,qy,qz,qw,tx,ty,tz,norm_bow_score,
    mono_inliers,stereo_inliers,stamp_ns`, evaluation/lc_result.py:121-138).
    """

    robot_a: jnp.ndarray  # (C,) int32
    frame_a: jnp.ndarray  # (C,) int32
    robot_b: jnp.ndarray  # (C,) int32
    frame_b: jnp.ndarray  # (C,) int32
    R: jnp.ndarray  # (C, 3, 3) relative pose b in a-frame
    t: jnp.ndarray  # (C, 3)
    mono_inliers: jnp.ndarray  # (C,) int32
    stereo_inliers: jnp.ndarray  # (C,) int32
    bow_score: jnp.ndarray  # (C,) float32
    status: jnp.ndarray  # (C,) int32 LCD_* codes
    accepted: jnp.ndarray  # (C,) bool


@flax.struct.dataclass
class GncState:
    """Graduated non-convexity (TLS) outer-loop state — role of the
    reference's GNC weight rounds (drawio:2175-2215)."""

    mu: jnp.ndarray  # () float32 — convexity parameter
    weights: jnp.ndarray  # (E,) float32 in [0, 1]
    barc2: jnp.ndarray  # () float32 — inlier threshold (squared)
    outer_iter: jnp.ndarray  # () int32


@flax.struct.dataclass
class LiftedPoseBlocks:
    """Rank-lifted pose variables, robot-blocked: Y (n_robots, n_poses, r, d+1).

    The RBCD decision variable (dpgo PGOAgent's X; SURVEY.md section 2.1).
    `active` masks dead robots (reference SET_ACTIVE_ROBOTS, drawio:2402).
    `num_poses` is the logical length of each robot's chain.
    """

    Y: jnp.ndarray  # (R, N, r, d+1)
    active: jnp.ndarray  # (R,) bool
    num_poses: jnp.ndarray  # (R,) int32

    @property
    def n_robots(self) -> int:
        return self.Y.shape[0]

    @property
    def pose_capacity(self) -> int:
        return self.Y.shape[1]

    @property
    def rank(self) -> int:
        return self.Y.shape[2]

    @property
    def d(self) -> int:
        return self.Y.shape[3] - 1

    @property
    def pose_valid(self) -> jnp.ndarray:
        idx = jnp.arange(self.pose_capacity)[None, :]
        return (idx < self.num_poses[:, None]) & self.active[:, None]
