"""FID machinery tests (SURVEY.md §4/§7 hard part #6)."""

import jax.numpy as jnp
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


def test_precision_recall_manifold_semantics(rng):
    """Improved P&R: identical distributions score high on both; a fake
    distribution that is a SUBSET of the reals keeps precision high but
    drops recall (mode collapse signature); disjoint clouds score ~0/0."""
    from gea.eval.fid import precision_recall

    real = rng.normal(0, 1, (256, 16))
    same = rng.normal(0, 1, (256, 16))
    # finite-sample k-NN manifolds are conservative (~0.7-0.9 for
    # identical 256x16-dim Gaussians) — the discriminative GAPS below
    # are the semantics under test
    p, r = precision_recall(real, same)
    assert p > 0.7 and r > 0.7
    # mode collapse: every fake lands in a tiny cluster around ONE real
    # point — precision stays high (inside the real manifold), recall
    # collapses (the tight fake manifold covers almost no reals)
    collapsed = real[:1] + rng.normal(0, 0.05, (256, 16))
    p_sub, r_sub = precision_recall(real, collapsed)
    assert p_sub > 0.9
    assert r_sub < 0.2
    # disjoint
    far = rng.normal(50, 1, (256, 16))
    p_far, r_far = precision_recall(real, far)
    assert p_far < 0.05 and r_far < 0.05


def test_frechet_rank_deficient_is_finite(rng):
    """Fewer samples than feature dims (rank-deficient covariance) must
    still yield a finite distance via eps regularization — a NaN here
    would silently corrupt best.json pinning."""
    from gea.eval.fid import FIDStats, frechet_distance

    d = 64
    a, b = FIDStats.empty(d), FIDStats.empty(d)
    a.update(rng.normal(0, 1, (8, d)))   # n=8 << d=64
    b.update(rng.normal(0.5, 1, (8, d)))
    fid = frechet_distance(a.mean, a.cov, b.mean, b.cov)
    assert np.isfinite(fid)
    same = frechet_distance(a.mean, a.cov, a.mean, a.cov)
    assert np.isfinite(same) and same < fid


def test_metric_bundle_matches_per_metric_paths(rng):
    """MetricBundle (the shared one-pass CLI plumbing) must reproduce the
    per-metric reference paths exactly: primary Frechet == compute_fid,
    frechet_b == compute_fid(extractor=random-b), KID == kid_score over
    compute_features matrices."""
    from gea.eval.fid import (
        MetricBundle,
        compute_features,
        kid_score,
        make_feature_extractor,
    )

    def batches(shift, seed, n=6):
        g = np.random.default_rng(seed)
        for _ in range(n):
            yield np.clip(
                g.normal(shift, 0.3, (64, 32, 32, 3)), -1, 1
            ).astype(np.float32)

    bundle = MetricBundle(32, extractor="random", second_opinion=True)
    bundle.set_reals(batches(0.0, 1), 256)
    g = bundle.group()
    g.consume(batches(0.6, 2), 256)
    row = bundle.row(g, ndigits=10)

    want, _ = compute_fid(
        batches(0.0, 1), batches(0.6, 2), image_size=32, num_samples=256,
        extractor="random",
    )
    np.testing.assert_allclose(row["frechet"], want, rtol=1e-6)
    want_b, label_b = compute_fid(
        batches(0.0, 1), batches(0.6, 2), image_size=32, num_samples=256,
        extractor="random-b",
    )
    assert bundle.label_b == label_b
    np.testing.assert_allclose(row["frechet_b"], want_b, rtol=1e-6)
    extract, _ = make_feature_extractor(32, "random")
    rf = compute_features(batches(0.0, 1), extract, 256)
    ff = compute_features(batches(0.6, 2), extract, 256)
    kid_mean, _ = kid_score(rf, ff)
    np.testing.assert_allclose(row["kid_x1000"], kid_mean * 1000, rtol=1e-6)


def test_online_fid_matches_compute_fid(rng):
    """OnlineFID (the --fid_interval tracker) precomputes real moments and
    scores repeated fake iterators identically to the one-shot path."""
    from gea.eval.fid import OnlineFID

    def batches(shift, seed, n=6):
        g = np.random.default_rng(seed)
        for _ in range(n):
            yield np.clip(
                g.normal(shift, 0.3, (64, 32, 32, 3)), -1, 1
            ).astype(np.float32)

    online = OnlineFID(
        batches(0.0, 1), image_size=32, num_samples=256, extractor="random"
    )
    one_shot, _ = compute_fid(
        batches(0.0, 1), batches(0.6, 2), image_size=32, num_samples=256,
        extractor="random",
    )
    np.testing.assert_allclose(
        online.score(batches(0.6, 2)), one_shot, rtol=1e-6
    )
    # repeated scoring is stateless on the real side
    np.testing.assert_allclose(
        online.score(batches(0.6, 2)), one_shot, rtol=1e-6
    )


@pytest.mark.slow
def test_inception_weights_path_upgrades_metric(tmp_path):
    """--inception_weights (VERDICT r1 #6): pointing at a local keras h5
    must build the true-FID extractor (2048-d pool features, label
    FID(inception-v3)) with no network. Fixture = a weights=None
    InceptionV3 saved to disk — same file format as the imagenet h5."""
    keras = pytest.importorskip("keras")
    from keras.applications.inception_v3 import InceptionV3

    from gea.eval.fid import make_feature_extractor

    w = tmp_path / "iv3.weights.h5"
    InceptionV3(include_top=False, weights=None, pooling="avg").save_weights(
        str(w)
    )
    extract, label = make_feature_extractor(
        64, "auto", inception_weights=str(w)
    )
    assert label == "FID(inception-v3)"
    feats = np.asarray(extract(jnp.zeros((2, 64, 64, 3), jnp.float32)))
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(feats))


def test_inception_weights_bad_path_fails_loudly():
    from gea.eval.fid import make_feature_extractor

    with pytest.raises(RuntimeError, match="weights are not available"):
        make_feature_extractor(
            64, "auto", inception_weights="/nonexistent/iv3.h5"
        )


def test_probe_cached_inception_env_override(tmp_path, monkeypatch):
    from gea.eval.fid import probe_cached_inception_weights

    fake = tmp_path / "w.h5"
    fake.write_bytes(b"x")
    monkeypatch.setenv("GEA_INCEPTION_WEIGHTS", str(fake))
    assert probe_cached_inception_weights() == str(fake)
    monkeypatch.delenv("GEA_INCEPTION_WEIGHTS")
    monkeypatch.setenv("KERAS_HOME", str(tmp_path))
    assert probe_cached_inception_weights() == ""


def test_kid_separates_distributions(rng):
    """KID (cubic-kernel MMD) ~0 for same-distribution feats, >0 and larger
    for a farther distribution — the second-opinion metric family
    (VERDICT r2 #7)."""
    from gea.eval.fid import kid_score

    a = rng.standard_normal((400, 32))
    a2 = rng.standard_normal((400, 32))
    near = rng.standard_normal((400, 32)) + 0.5
    far = rng.standard_normal((400, 32)) + 2.0
    same, _ = kid_score(a, a2, subset_size=200, n_subsets=5)
    k_near, _ = kid_score(a, near, subset_size=200, n_subsets=5)
    k_far, _ = kid_score(a, far, subset_size=200, n_subsets=5)
    assert abs(same) < 0.05
    assert k_near > same
    assert k_far > k_near  # monotone in distribution distance


def test_second_opinion_extractor_is_independent(rng):
    """random-b must be a genuinely different feature basis (different
    widths/seed), not the primary under a new label."""
    import jax.numpy as jnp

    from gea.eval.fid import make_feature_extractor

    ex_a, label_a = make_feature_extractor(16, "random")
    ex_b, label_b = make_feature_extractor(16, "random-b")
    assert label_a == "proxy-FID(random-cnn)"
    assert label_b == "proxy-FID(random-cnn-b)"
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    fa = np.asarray(ex_a(x))
    fb = np.asarray(ex_b(x))
    assert fa.shape[-1] == 256 and fb.shape[-1] == 192


def test_compute_features_matches_stats(rng):
    from gea.eval.fid import FIDStats, compute_features, make_feature_extractor

    ex, _ = make_feature_extractor(16, "random")
    batches = [
        rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
        for _ in range(3)
    ]
    feats = compute_features(iter(batches), ex, max_samples=10)
    assert feats.shape[0] == 10
    stats = FIDStats.empty(feats.shape[1])
    stats.update(feats)
    np.testing.assert_allclose(stats.mean, feats.mean(axis=0), rtol=1e-6)
