"""kimera_multi_tpu — a TPU-native multi-robot SLAM back-end.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Kimera-Multi
(reference: /root/reference, roboyu/Kimera-Multi): distributed loop-closure
detection (BoW matching + RANSAC geometric verification), robust distributed
pose-graph optimization (GNC + Riemannian block-coordinate descent on
rank-lifted pose blocks), pose-graph coarsening, trajectory/mesh correction,
and the surrounding evaluation/logging contract.

Layer map (SURVEY.md section 7.1):
  core/      SE(3)/SO(3)+Stiefel manifold ops, threefry RNG policy, schemas
  kernels/   Pallas/XLA: hamming-knn, bow-score, batched RANSAC, block linalg
  solve/     GNC-TLS, RBCD, chordal init, PCM, fixed-lag smoother, deformation
  dist/      robot meshes, bulk-synchronous round scheduler, fault masks
  frontend/  BoW vocab/db, LCD candidate generation + verification, submaps
  vio/       IMU preintegration, feature tracking, fixed-lag VIO (phase 2)
  io/        dataset readers, reference-schema CSV/TUM writers, config import
  eval/      evo-equivalent APE, loop-closure forensics
  cli/       run entry points mirroring the reference's run.sh modes
"""

__version__ = "0.1.0"

# Precision policy: geometry/solver math written in f32 must actually run in
# f32 — TPU XLA lowers f32 matmuls to bf16 passes under DEFAULT precision,
# which breaks Lie-group math (observed: 8e-3 rotation-matrix error from a
# single bf16 3x3 matmul). Hot kernels (e.g. the Hamming bit-matmul) opt into
# bf16 explicitly by casting their inputs, which this setting does not touch.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
