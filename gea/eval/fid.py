"""Frechet distance evaluation (SURVEY.md §7 hard part #6).

The acceptance metric for the rebuild is "FID parity vs reference"
(BASELINE.json), but the reference publishes no FID and this image has no
network access and no cached InceptionV3 weights. Strategy, as SURVEY.md
§7 prescribes ("substitute a documented proxy ... and flag it"):

* ``extractor="inception"`` — the standard FID feature network. "auto"
  upgrades to it only when weights are already on disk (keras cache,
  $GEA_INCEPTION_WEIGHTS, or --inception_weights); only an EXPLICIT
  "inception" request may attempt a (time-bounded) download, because a
  hanging download inside a tracker init stalls training (round 4).
  Raises a clear error when weights can't be materialized.
* ``extractor="random"`` (default fallback) — a frozen, fixed-seed
  random-projection CNN over image patches. Random-feature Frechet
  distances are a known cheap proxy that rank-correlates with
  Inception-FID for within-architecture comparisons; every report labels
  the metric ``proxy-FID(random-cnn)`` so it can never be confused with
  true FID.

The Frechet machinery itself (Gaussian moment accumulation + the
``||mu1-mu2||^2 + tr(C1 + C2 - 2 sqrt(C1 C2))`` distance) is exact and
extractor-agnostic, so plugging real Inception weights in a later round
changes one function.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FeatureExtractor = Callable[[jnp.ndarray], jnp.ndarray]


# ----------------------------------------------------------------- stats


@dataclasses.dataclass
class FIDStats:
    """Streaming Gaussian moments of a feature distribution."""

    n: int
    sum: np.ndarray  # (D,)
    outer: np.ndarray  # (D, D)

    @classmethod
    def empty(cls, dim: int) -> "FIDStats":
        return cls(0, np.zeros(dim, np.float64), np.zeros((dim, dim), np.float64))

    def update(self, feats: np.ndarray) -> None:
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.sum += f.sum(axis=0)
        self.outer += f.T @ f

    @property
    def mean(self) -> np.ndarray:
        return self.sum / max(1, self.n)

    @property
    def cov(self) -> np.ndarray:
        mu = self.mean
        return self.outer / max(1, self.n - 1) - np.outer(mu, mu) * (
            self.n / max(1, self.n - 1)
        )


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray
) -> float:
    """d^2 = ||mu1-mu2||^2 + tr(C1 + C2 - 2 (C1 C2)^{1/2})."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(cov1 @ cov2, disp=False)
    if not np.all(np.isfinite(covmean)):
        # Rank-deficient covariances (sample count <= feature dim) can
        # make sqrtm blow up; retry with the standard eps*I diagonal
        # regularization rather than report NaN into best.json.
        eps = 1e-6 * max(np.trace(cov1), np.trace(cov2), 1.0) / cov1.shape[0]
        off = eps * np.eye(cov1.shape[0])
        covmean, _ = linalg.sqrtm((cov1 + off) @ (cov2 + off), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    fid = float(
        diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * np.trace(covmean)
    )
    if not np.isfinite(fid):
        raise FloatingPointError(
            "frechet_distance is non-finite even after eps regularization "
            "(degenerate covariance — too few samples for the feature dim?)"
        )
    return fid


# ------------------------------------------------------------ extractors


def _random_cnn_extractor(
    image_size: int,
    feature_dim: int = 256,
    seed: int = 1234,
    chans: Optional[Tuple[int, ...]] = None,
) -> FeatureExtractor:
    """Frozen fixed-seed conv feature net: 4 stride-2 conv+relu stages with
    orthogonal-ish gaussian filters, global average + max pool head,
    projected to `feature_dim`. Deterministic across processes."""
    rng = jax.random.PRNGKey(seed)
    keys = jax.random.split(rng, 6)
    chans = list(chans) if chans is not None else [3, 32, 64, 128, 256]
    kernels = []
    for i in range(4):
        fan_in = 3 * 3 * chans[i]
        kernels.append(
            jax.random.normal(keys[i], (3, 3, chans[i], chans[i + 1]))
            * np.sqrt(2.0 / fan_in)
        )
    proj = jax.random.normal(keys[4], (2 * chans[-1], feature_dim)) * np.sqrt(
        1.0 / (2 * chans[-1])
    )

    @jax.jit
    def extract(images: jnp.ndarray) -> jnp.ndarray:
        x = images.astype(jnp.float32)
        for k in kernels:
            x = jax.lax.conv_general_dilated(
                x,
                k.astype(jnp.float32),
                window_strides=(2, 2),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jax.nn.relu(x)
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        h = jnp.concatenate([avg, mx], axis=-1)
        return h @ proj

    return extract


def probe_cached_inception_weights() -> str:
    """Look for InceptionV3 weights already on disk (no network in this
    image, so only pre-cached files can upgrade proxy-FID to true FID).

    Probed locations (documented negative result for this image as of
    round 2: all empty — keras cache bare, no torch hub cache, torchvision
    not installed):
    * $KERAS_HOME or ~/.keras/models/ (keras download cache)
    * ~/.cache/torch/hub/checkpoints/ (torch hub; torchvision absent here
      so a .pth would still need the keras path — reported for diagnosis)
    * $GEA_INCEPTION_WEIGHTS (explicit override)
    """
    import os

    env = os.environ.get("GEA_INCEPTION_WEIGHTS", "")
    if env and os.path.exists(env):
        return env
    keras_home = os.environ.get(
        "KERAS_HOME", os.path.join(os.path.expanduser("~"), ".keras")
    )
    for name in (
        "inception_v3_weights_tf_dim_ordering_tf_kernels_notop.h5",
        "inception_v3_weights_tf_dim_ordering_tf_kernels.h5",
    ):
        p = os.path.join(keras_home, "models", name)
        if os.path.exists(p):
            return p
    return ""


def _inception_extractor(
    image_size: int, weights: str = "imagenet"
) -> FeatureExtractor:
    """True-FID extractor via keras InceptionV3 (pool3/avg features, 2048-d).

    `weights` is either the literal "imagenet" (needs a cache or network)
    or a local .h5/.weights.h5 path (--inception_weights): the moment a
    weights file exists, the metric upgrades itself (VERDICT r1 #6)."""
    try:
        from keras.applications.inception_v3 import InceptionV3
    except Exception as e:  # pragma: no cover
        raise RuntimeError(f"keras InceptionV3 unavailable: {e}") from e
    try:
        if weights == "imagenet":
            model = InceptionV3(
                include_top=False, weights="imagenet", pooling="avg"
            )
        else:
            model = InceptionV3(
                include_top=False, weights=None, pooling="avg"
            )
            model.load_weights(weights)
    except Exception as e:
        raise RuntimeError(
            "InceptionV3 weights are not available "
            f"({weights!r}); use extractor='random' (proxy-FID) or pass "
            "--inception_weights <path-to-keras-h5>. "
            f"Underlying error: {e}"
        ) from e

    def extract(images: jnp.ndarray) -> jnp.ndarray:
        import tensorflow as tf

        x = np.asarray(images, np.float32)  # [-1, 1], already Inception range
        x = tf.image.resize(x, (299, 299)).numpy()
        return jnp.asarray(model(x, training=False).numpy())

    return extract


_inception_unavailable = False


def make_feature_extractor(
    image_size: int, extractor: str = "auto", inception_weights: str = ""
) -> Tuple[FeatureExtractor, str]:
    """Returns (fn, label). label is embedded in every report."""
    global _inception_unavailable
    if inception_weights:
        # An explicit weights file must work or fail loudly — never fall
        # back silently to the proxy when the user asked for true FID.
        return (
            _inception_extractor(image_size, weights=inception_weights),
            "FID(inception-v3)",
        )
    if extractor == "inception" or (
        extractor == "auto" and not _inception_unavailable
    ):
        cached = probe_cached_inception_weights()
        if not cached and extractor == "auto":
            # "auto" upgrades to true FID only from weights already on
            # disk. It must NEVER attempt a network download inside a
            # trainer/tracker init: on this image the keras download
            # does not fail fast — a DNS blackhole hung a tracked
            # 256x256 training run indefinitely before its first step
            # (round 4). Explicit extractor="inception" (or
            # --inception_weights) may still try, time-bounded below.
            _inception_unavailable = True
        else:
            import socket

            prev = socket.getdefaulttimeout()
            try:
                if not cached:
                    socket.setdefaulttimeout(30.0)  # bound the download
                return (
                    _inception_extractor(
                        image_size, weights=cached or "imagenet"
                    ),
                    "FID(inception-v3)",
                )
            except RuntimeError:
                _inception_unavailable = True  # don't re-attempt downloads
                if extractor == "inception":
                    raise
            finally:
                socket.setdefaulttimeout(prev)
    if extractor == "random-b":
        # Independent second-opinion proxy (VERDICT r2 #7): different
        # seed, different widths, different head dimensionality — rank
        # agreement between the two proxies is evidence a result is not
        # an artifact of one particular random feature basis.
        return (
            _random_cnn_extractor(
                image_size,
                feature_dim=192,
                seed=7777,
                chans=(3, 24, 48, 96, 192),
            ),
            "proxy-FID(random-cnn-b)",
        )
    return (
        _random_cnn_extractor(image_size),
        "proxy-FID(random-cnn)",
    )


# ----------------------------------------------------------------- KID


def compute_features(
    batches: Iterable[np.ndarray],
    extract: FeatureExtractor,
    max_samples: int,
) -> np.ndarray:
    """Raw feature matrix (N, D) — KID needs samples, not just moments."""
    feats = []
    seen = 0
    for batch in batches:
        f = np.asarray(jax.device_get(extract(jnp.asarray(batch))))
        take = min(f.shape[0], max_samples - seen)
        feats.append(f[:take].astype(np.float64))
        seen += take
        if seen >= max_samples:
            break
    if not feats:
        raise ValueError("no samples provided to compute_features")
    return np.concatenate(feats, axis=0)


def precision_recall(
    real_feats: np.ndarray,
    fake_feats: np.ndarray,
    k: int = 3,
) -> Tuple[float, float]:
    """Improved precision & recall (Kynkäänniemi et al. 2019): manifold
    membership via k-NN radii. precision = fraction of fakes inside the
    real manifold (fidelity), recall = fraction of reals inside the fake
    manifold (diversity/coverage). Splits the two failure modes a single
    scalar distance (FID/KID) conflates — exactly the trade the
    error-avoidance correction claims to make (fidelity up, coverage at
    risk)."""

    real = _pr_cap(real_feats)
    fake = _pr_cap(fake_feats)
    if min(real.shape[0], fake.shape[0]) <= k:
        raise ValueError(
            f"precision_recall needs > k={k} samples per side, got "
            f"{real.shape[0]} real / {fake.shape[0]} fake"
        )
    return (
        _pr_covered(fake, real, _pr_radii2(real, k)),   # precision
        _pr_covered(real, fake, _pr_radii2(fake, k)),   # recall
    )


def _pr_cap(x: np.ndarray, cap: int = 4096) -> np.ndarray:
    """Bound the dense NxM distance matrices (4096^2 f64 = 134 MB)."""
    x = np.asarray(x, np.float64)
    if x.shape[0] > cap:
        x = x[np.random.default_rng(0).choice(x.shape[0], cap, replace=False)]
    return x


def _pr_dist2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Squared euclidean distances via the |a|^2+|b|^2-2ab expansion —
    O(N*M) memory. A broadcast (a[:,None]-b[None]) materializes an
    O(N*M*D) intermediate: 34 GB at the eval defaults (4096^2 x 256 f64)."""
    d2 = (
        np.sum(a * a, axis=1)[:, None]
        + np.sum(b * b, axis=1)[None, :]
        - 2.0 * (a @ b.T)
    )
    return np.maximum(d2, 0.0)


def _pr_radii2(x: np.ndarray, k: int) -> np.ndarray:
    """Squared distance to each point's k-th nearest neighbor."""
    d2 = _pr_dist2(x, x)
    np.fill_diagonal(d2, np.inf)
    return np.partition(d2, k - 1, axis=1)[:, k - 1]


def _pr_covered(q: np.ndarray, ref: np.ndarray, ref_r2: np.ndarray) -> float:
    d2 = _pr_dist2(q, ref)
    return float(np.mean(np.any(d2 <= ref_r2[None, :], axis=1)))


def _poly_kernel(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    d = x.shape[1]
    return (x @ y.T / d + 1.0) ** 3


def kid_score(
    real_feats: np.ndarray,
    fake_feats: np.ndarray,
    subset_size: int = 256,
    n_subsets: int = 20,
    seed: int = 0,
) -> Tuple[float, float]:
    """Kernel Inception Distance (Binkowski et al. 2018): unbiased MMD^2
    with the cubic polynomial kernel k(x,y) = (x.y/D + 1)^3, averaged over
    random subsets. Returns (mean, std-across-subsets). A second offline
    metric FAMILY next to the Frechet distance (VERDICT r2 #7): unbiased
    (no Gaussian assumption), so rank agreement between proxy-FID and
    proxy-KID is evidence the ranking is not a Frechet/Gaussian artifact."""
    rng = np.random.default_rng(seed)
    m = min(subset_size, real_feats.shape[0], fake_feats.shape[0])
    scores = []
    for _ in range(n_subsets):
        x = real_feats[rng.choice(real_feats.shape[0], m, replace=False)]
        y = fake_feats[rng.choice(fake_feats.shape[0], m, replace=False)]
        kxx = _poly_kernel(x, x)
        kyy = _poly_kernel(y, y)
        kxy = _poly_kernel(x, y)
        mmd2 = (
            (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
            + (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
            - 2.0 * kxy.mean()
        )
        scores.append(mmd2)
    return float(np.mean(scores)), float(np.std(scores))


# --------------------------------------------------------------- driver


def compute_stats(
    batches: Iterable[np.ndarray],
    extract: FeatureExtractor,
    max_samples: int,
) -> FIDStats:
    stats: Optional[FIDStats] = None
    seen = 0
    for batch in batches:
        feats = np.asarray(jax.device_get(extract(jnp.asarray(batch))))
        if stats is None:
            stats = FIDStats.empty(feats.shape[-1])
        take = min(feats.shape[0], max_samples - seen)
        stats.update(feats[:take])
        seen += take
        if seen >= max_samples:
            break
    if stats is None or seen == 0:
        raise ValueError("no samples provided to compute_stats")
    return stats


def compute_fid(
    real_batches: Iterable[np.ndarray],
    fake_batches: Iterable[np.ndarray],
    image_size: int,
    num_samples: int = 10_000,
    extractor: str = "auto",
    inception_weights: str = "",
) -> Tuple[float, str]:
    extract, label = make_feature_extractor(
        image_size, extractor, inception_weights=inception_weights
    )
    rs = compute_stats(real_batches, extract, num_samples)
    fs = compute_stats(fake_batches, extract, num_samples)
    return frechet_distance(rs.mean, rs.cov, fs.mean, fs.cov), label


class GroupAccumulator:
    """Streaming multi-metric accumulator for one image group (a fake
    stream, one LIS stage, one correction-chain link, ...). Every enabled
    metric is fed from a SINGLE feature extraction per batch."""

    def __init__(self, bundle: "MetricBundle"):
        self._b = bundle
        self.stats: Optional[FIDStats] = None
        self.stats_b: Optional[FIDStats] = None
        self.feats: list = []  # raw primary feats (float64) for KID
        self.n = 0

    def update(self, images) -> None:
        b = self._b
        feats = np.asarray(jax.device_get(b.extract(jnp.asarray(images))))
        if self.stats is None:
            self.stats = FIDStats.empty(feats.shape[-1])
        self.stats.update(feats)
        self.n += feats.shape[0]
        if b.extract_b is not None:
            self.feats.append(feats.astype(np.float64))
            fb = np.asarray(jax.device_get(b.extract_b(jnp.asarray(images))))
            if self.stats_b is None:
                self.stats_b = FIDStats.empty(fb.shape[-1])
            self.stats_b.update(fb)

    def consume(self, batches: Iterable[np.ndarray], max_samples: int) -> None:
        """Drain up to max_samples images from a batch iterator."""
        for batch in batches:
            batch = np.asarray(batch)
            take = min(batch.shape[0], max_samples - self.n)
            self.update(batch[:take])
            if self.n >= max_samples:
                return
        if self.n == 0:
            raise ValueError("no samples provided")


class MetricBundle:
    """All offline metrics over shared feature extractions.

    One primary extractor (+ optionally the independent ``random-b`` net
    and KID, the ``--second_opinion`` surface) scored against ONE pass
    over the real dataset — the per-metric re-walks the r3 CLIs started
    with tripled the end-to-end eval cost (each metric re-rendered every
    fake and re-decoded every real)."""

    def __init__(
        self,
        image_size: int,
        extractor: str = "auto",
        inception_weights: str = "",
        second_opinion: bool = False,
    ):
        self.extract, self.label = make_feature_extractor(
            image_size, extractor, inception_weights=inception_weights
        )
        self.extract_b = self.label_b = None
        if second_opinion:
            self.extract_b, self.label_b = make_feature_extractor(
                image_size, "random-b"
            )
        self.pr_k = 3  # k-NN manifold size for precision/recall
        self._reals: Optional[GroupAccumulator] = None
        self._rf = self._rf_pr = self._real_r2 = None

    def group(self) -> GroupAccumulator:
        return GroupAccumulator(self)

    def set_reals(
        self, batches: Iterable[np.ndarray], max_samples: int
    ) -> None:
        self._reals = self.group()
        self._reals.consume(batches, max_samples)
        # Cache the real-side matrices once — row() runs per stage/link
        # and must not redo the concat + k-NN radii each time.
        self._rf = self._rf_pr = self._real_r2 = None
        if self.extract_b is not None:
            self._rf = np.concatenate(self._reals.feats, axis=0)
            self._reals.feats = []  # moments already accumulated; drop
            self._rf_pr = _pr_cap(self._rf)
            if self._rf_pr.shape[0] > self.pr_k:
                self._real_r2 = _pr_radii2(self._rf_pr, self.pr_k)

    def row(self, g: GroupAccumulator, ndigits: int = 4) -> dict:
        """Metric dict for one group vs the reals."""
        r = self._reals
        assert r is not None and r.stats is not None and g.stats is not None
        out = {
            "frechet": round(
                frechet_distance(
                    r.stats.mean, r.stats.cov, g.stats.mean, g.stats.cov
                ),
                ndigits,
            )
        }
        if self.extract_b is not None:
            out["frechet_b"] = round(
                frechet_distance(
                    r.stats_b.mean, r.stats_b.cov,
                    g.stats_b.mean, g.stats_b.cov,
                ),
                ndigits,
            )
            gf = np.concatenate(g.feats, axis=0)
            kid_mean, kid_std = kid_score(self._rf, gf)
            out["kid_x1000"] = round(kid_mean * 1000, ndigits)
            out["kid_x1000_std"] = round(kid_std * 1000, ndigits)
            # Third family: fidelity/diversity split over the same feats
            # (real radii cached by set_reals). Too-small groups report
            # null rather than crash a tiny smoke eval.
            gf_pr = _pr_cap(gf)
            if self._real_r2 is not None and gf_pr.shape[0] > self.pr_k:
                out["precision"] = round(
                    _pr_covered(gf_pr, self._rf_pr, self._real_r2), ndigits
                )
                out["recall"] = round(
                    _pr_covered(
                        self._rf_pr, gf_pr, _pr_radii2(gf_pr, self.pr_k)
                    ),
                    ndigits,
                )
            else:
                out["precision"] = out["recall"] = None
        return out


class OnlineFID:
    """Real-side moments computed once, fake side scored repeatedly — the
    in-training `--fid_interval` tracker (GAN quality is non-monotone, so
    the trainer itself should know which snapshot is best rather than
    leaving a post-hoc eval_stages hunt to the user)."""

    def __init__(
        self,
        real_batches: Iterable[np.ndarray],
        image_size: int,
        num_samples: int = 1024,
        extractor: str = "auto",
        inception_weights: str = "",
    ):
        self.extract, self.label = make_feature_extractor(
            image_size, extractor, inception_weights=inception_weights
        )
        self.num_samples = num_samples
        rs = compute_stats(real_batches, self.extract, num_samples)
        self._mu, self._cov = rs.mean, rs.cov

    def score(self, fake_batches: Iterable[np.ndarray]) -> float:
        fs = compute_stats(fake_batches, self.extract, self.num_samples)
        return frechet_distance(self._mu, self._cov, fs.mean, fs.cov)
