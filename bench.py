"""Benchmark: loop-closure verifications/s/chip (the north-star kernel).

Measures the full `verifyLoopSpin` equivalent per candidate (SURVEY.md
section 3.2 hot loop): Hamming 2-NN matching over 700x700 packed ORB
descriptors (MXU bit-matmul) + Lowe ratio 0.7 + monocular essential RANSAC
(500 hypotheses) + 3d3d Arun RANSAC (500 hypotheses) + acceptance gates
(mono >= 10, stereo >= 5) — reference envelope from
params/D455/LcdParams.yaml:16,51-52,64.

Baseline: the reference publishes no numbers in-repo (BASELINE.json
`published: {}`); its CPU front-end runs verifications sequentially per
robot. Measured-estimate used as `vs_baseline` denominator: 75
verifications/s for one CPU core (OpenCV BF-Hamming 700x700 knn ~2 ms +
500-iteration opengv RANSAC x2 ~10 ms; see BASELINE.md protocol). The
secondary metric (RBCD round rate on a 6-robot campus-scale graph) is
printed to stderr.

Prints ONE JSON line to stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_VERIFICATIONS_PER_S = 75.0  # measured-estimate, single CPU core (see above)


def make_candidates(n_cand: int, K: int, seed: int = 0):
    import jax.numpy as jnp

    npr = np.random.default_rng(seed)
    desc_a = npr.integers(0, 256, (n_cand, K, 32), dtype=np.uint8)
    desc_b = desc_a.copy()
    # ~60% true matches with bit noise, 40% clutter
    clutter = npr.uniform(size=(n_cand, K)) < 0.4
    flips = npr.integers(0, 32, (n_cand, K))
    for c in range(n_cand):
        desc_b[c, np.arange(K), flips[c]] ^= 7
        idx = np.nonzero(clutter[c])[0]
        desc_b[c, idx] = npr.integers(0, 256, (len(idx), 32), dtype=np.uint8)
    P = npr.uniform(-4, 4, (n_cand, K, 3)).astype(np.float32)
    P[..., 2] += 8.0
    R = _rand_rot(npr, n_cand)
    t = npr.uniform(-1, 1, (n_cand, 3)).astype(np.float32)
    Pb = np.einsum("cij,ckj->cki", R.transpose(0, 2, 1), P - t[:, None, :])
    bear_a = P / np.linalg.norm(P, axis=-1, keepdims=True)
    bear_b = Pb / np.linalg.norm(Pb, axis=-1, keepdims=True)
    valid = np.ones((n_cand, K), bool)
    return tuple(
        jnp.asarray(x)
        for x in (desc_a, desc_b, bear_a.astype(np.float32),
                  bear_b.astype(np.float32), P, Pb.astype(np.float32), valid)
    )


def _rand_rot(npr, n):
    import jax.numpy as jnp

    from kimera_multi_tpu.core import lie

    w = npr.normal(0, 0.4, (n, 3)).astype(np.float32)
    return np.asarray(lie.so3_exp(jnp.asarray(w)))


def build_verify_fn(n_hyp: int = 500):
    import jax
    import jax.numpy as jnp

    from kimera_multi_tpu.core import rng as rngmod
    from kimera_multi_tpu.kernels import hamming, ransac

    def verify_one(cand_id, m, fa, fb, pa, pb):
        matched = m >= 0
        idx = jnp.maximum(m, 0)
        kmono = rngmod.derive(rngmod.base_key(0), cand_id,
                              rngmod.Stream.RANSAC_MONO)
        mono = ransac.ransac_essential(kmono, fa, fb[idx], matched,
                                       n_hyp=n_hyp, min_inliers=10)
        kst = rngmod.derive(rngmod.base_key(0), cand_id,
                            rngmod.Stream.RANSAC_STEREO)
        st = ransac.ransac_arun(kst, pa, pb[idx], matched, n_hyp=n_hyp,
                                min_inliers=5)
        return {
            "ok": mono["ok"] & st["ok"],
            "mono": mono["n_inliers"],
            "stereo": st["n_inliers"],
            "R": st["R"],
            "t": st["t"],
        }

    @jax.jit
    def verify_batch(da, db, fa, fb, pa, pb, v):
        # batched Pallas pair matching (fused Hamming matmul + top-2)
        m, _ = hamming.knn2_lowe_match_pairs(da, v, db, v, lowe_ratio=0.7)
        ids = jnp.arange(da.shape[0])
        return jax.vmap(verify_one)(ids, m, fa, fb, pa, pb)

    return verify_batch


def bench_verifications(n_cand=128, K=704, reps=10):
    import jax

    args = make_candidates(n_cand, K)
    fn = build_verify_fn()
    out = fn(*args)  # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    vps = n_cand * reps / dt
    acc = float(np.asarray(out["ok"]).mean())
    return vps, acc


def bench_rbcd(n_robots=6, n_poses=256, reps=5):
    import jax
    import jax.numpy as jnp

    from kimera_multi_tpu.core import rng as rngmod, stiefel
    from kimera_multi_tpu.io.synthetic import multi_robot_graph
    from kimera_multi_tpu.solve import pgo, rbcd

    g = multi_robot_graph(seed=2, n_robots=n_robots, n_poses=n_poses,
                          outlier_ratio=0.2, n_intra_lc=16, n_inter_lc=16)
    params0 = pgo.init_from_odometry(g.edges, g.n_robots, g.poses_per_robot)
    ylift = stiefel.random_lifting_matrix(
        rngmod.derive(rngmod.base_key(0), rngmod.Stream.LIFTING), 5, 3)
    Y0 = rbcd.lift_params(params0, ylift, g.n_robots, g.poses_per_robot)
    cfg = rbcd.RbcdConfig()
    active = jnp.ones(g.n_robots, bool)
    w = jnp.ones(g.edges.capacity)

    import jax

    @jax.jit
    def one_round(Y):
        return rbcd.rbcd_round_reference(Y, active, g.edges, w, cfg,
                                         g.poses_per_robot)

    Y = one_round(Y0)
    jax.block_until_ready(Y)
    t0 = time.perf_counter()
    for _ in range(reps):
        Y = one_round(Y)
    jax.block_until_ready(Y)
    dt = time.perf_counter() - t0
    return reps / dt  # rounds/s (each = cfg.inner_iters block-Newton cycles)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}", file=sys.stderr)

    vps, acc = bench_verifications()
    print(f"verifications/s/chip: {vps:.1f} (acceptance rate {acc:.2f})",
          file=sys.stderr)
    try:
        rps = bench_rbcd()
        print(f"rbcd rounds/s (6x256 graph): {rps:.2f}", file=sys.stderr)
    except Exception as e:  # secondary metric must not kill the bench
        print(f"rbcd bench failed: {e}", file=sys.stderr)
        rps = None

    print(json.dumps({
        "metric": "lc_verifications_per_s_per_chip",
        "value": round(vps, 1),
        "unit": "verifications/s",
        "vs_baseline": round(vps / REF_VERIFICATIONS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
