"""5-point vs 8-point mono gate under high outlier ratios (VERDICT item 7).

The reference's mono verification is 5-point Nister/Stewenius with a
500-hypothesis budget (params/D455/LcdParams.yaml:55-74, drawio:2589-2593).
An 8-point minimal sample needs 8 clean correspondences per hypothesis, so
at high outlier ratios its per-hypothesis success probability collapses:
at 70% outliers P(clean sample) is 0.3^8 ~ 7e-5 vs 0.3^5 ~ 2e-3. This test
measures inlier recall of both paths on the same problems and gates the
`use_5pt` default flip: the 5-pt path must dominate at 60-70% outliers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kimera_multi_tpu.core import lie, rng as rngmod
from kimera_multi_tpu.frontend.dlc import FrontendConfig
from kimera_multi_tpu.kernels import ransac


K = 160


def _problem(seed, outlier_ratio):
    npr = np.random.default_rng(seed)
    P = npr.uniform(-3, 3, (K, 3)).astype(np.float32)
    P[:, 2] = npr.uniform(4, 10, K)
    w = npr.normal(0, 0.3, 3).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = npr.uniform(-1, 1, 3).astype(np.float32)
    P2 = (P - t[None]) @ R  # R^T (P - t)
    f1 = P / np.linalg.norm(P, axis=1, keepdims=True)
    f2 = P2 / np.linalg.norm(P2, axis=1, keepdims=True)
    is_out = npr.uniform(size=K) < outlier_ratio
    idx = np.nonzero(is_out)[0]
    f2[idx] = f2[npr.permutation(idx)]  # shuffled associations
    return (jnp.asarray(f1), jnp.asarray(f2.astype(np.float32)),
            ~is_out)


@pytest.mark.parametrize("outlier_ratio", [0.5, 0.6, 0.7])
def test_5pt_recall_dominates_8pt(outlier_ratio):
    fn5 = jax.jit(lambda k, a, b, v: ransac.ransac_essential_5pt(
        k, a, b, v, n_hyp=500, min_inliers=10))
    fn8 = jax.jit(lambda k, a, b, v: ransac.ransac_essential(
        k, a, b, v, n_hyp=500, min_inliers=10))
    rec5, rec8, ok5, ok8 = [], [], 0, 0
    n_trials = 8
    for s in range(n_trials):
        f1, f2, clean = _problem(1000 + s, outlier_ratio)
        v = jnp.ones(K, bool)
        key = rngmod.derive(rngmod.base_key(0), s)
        o5 = fn5(key, f1.T, f2.T, v)
        o8 = fn8(key, f1.T, f2.T, v)
        n_clean = clean.sum()
        r5 = float(np.asarray(o5["inliers"])[clean].sum() / n_clean)
        r8 = float(np.asarray(o8["inliers"])[clean].sum() / n_clean)
        rec5.append(r5)
        rec8.append(r8)
        ok5 += int(r5 > 0.8)
        ok8 += int(r8 > 0.8)
    m5, m8 = np.mean(rec5), np.mean(rec8)
    # equal-or-better mean recall, and strictly more successes at 70%
    assert m5 >= m8 - 0.02, (outlier_ratio, m5, m8)
    if outlier_ratio >= 0.7:
        assert ok5 > ok8, (ok5, ok8)
        assert ok5 >= n_trials * 0.6, ok5


def test_default_is_5pt():
    """Gate for the config flip (reference parity: LcdParams 5-pt)."""
    assert FrontendConfig().use_5pt is True
