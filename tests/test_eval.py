"""FID machinery tests (SURVEY.md §4/§7 hard part #6)."""

import numpy as np
import pytest

from gea.eval.fid import (
    FIDStats,
    compute_fid,
    frechet_distance,
    make_feature_extractor,
)


def test_stats_streaming_matches_direct(rng):
    x = rng.standard_normal((500, 16))
    stats = FIDStats.empty(16)
    for i in range(0, 500, 100):
        stats.update(x[i : i + 100])
    np.testing.assert_allclose(stats.mean, x.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(stats.cov, np.cov(x, rowvar=False), atol=1e-8)


def test_frechet_identical_is_zero(rng):
    x = rng.standard_normal((400, 8))
    mu, cov = x.mean(0), np.cov(x, rowvar=False)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_frechet_known_value():
    """Isotropic gaussians: d^2 = ||dmu||^2 + sum (sqrt(s1)-sqrt(s2))^2."""
    d = 4
    mu1, mu2 = np.zeros(d), np.full(d, 2.0)
    c1, c2 = np.eye(d) * 4.0, np.eye(d) * 1.0
    expect = 4.0 * d + d * (2.0 - 1.0) ** 2
    got = frechet_distance(mu1, c1, mu2, c2)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_random_extractor_deterministic(rng):
    ex1, label1 = make_feature_extractor(32, "random")
    ex2, _ = make_feature_extractor(32, "random")
    img = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    f1 = np.asarray(ex1(img))
    f2 = np.asarray(ex2(img))
    np.testing.assert_allclose(f1, f2, atol=1e-6)
    assert label1 == "proxy-FID(random-cnn)"


def test_compute_fid_separates_distributions(rng):
    def batches(shift, n=6):
        for _ in range(n):
            yield np.clip(
                rng.normal(shift, 0.3, (64, 32, 32, 3)), -1, 1
            ).astype(np.float32)

    same, label = compute_fid(
        batches(0.0), batches(0.0), image_size=32, num_samples=256,
        extractor="random",
    )
    diff, _ = compute_fid(
        batches(0.0), batches(0.6), image_size=32, num_samples=256,
        extractor="random",
    )
    assert "proxy-FID" in label
    assert diff > same
    assert diff > 10 * max(same, 1e-6)
