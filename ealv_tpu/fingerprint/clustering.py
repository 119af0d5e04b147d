"""Object discovery: uncertainty-scored sampling + clustering.

Parity target: dist_modules/clustering.py find_clusters (:97-231) and
process_clusters (:334-394): sample candidate poses, score each by the
model's mean decoded image variance under a batch of replay seeds
(decode_samples_only -> exp -> mean, cubed :184-199), reweight-resample
toward informative regions, cluster (MeanShift / kmeans / GMM), and merge
overlapping cluster centers (:213-231).

TPU-first: the S-seed x N-sample variance scoring — the reference loops
seeds and chunk-decodes on CPU threads — is one vmapped batched decode.
Mean-shift runs as a fixed-iteration jitted kernel; kmeans/GMM variants use
sklearn on host (parity fallbacks, small data).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import CVAE
from ..models.cvae import ModelState, update_dist


def score_samples(model: CVAE, params, seeds_x, seeds_y, samples,
                  seeds_force=None):
    """Mean decoded variance of ``samples`` under each seed's z, averaged
    over seeds and cubed (parity: clustering.py:184-203).

    seeds_x: (S, s_dim), seeds_y: (S, H, W, C), samples: (N, s_dim) ->
    (N,) unnormalized "objectness" weights.
    """
    from .identify import _encode_seed_z  # shared batched seeding

    z_seeds = _encode_seed_z(model, params, seeds_x, seeds_y, seeds_force)

    def per_seed(z, sx):
        x = samples - sx[None, :] if model.dx else samples
        n = samples.shape[0]
        feat, y_logvar, _ = model.apply(
            params,
            jnp.broadcast_to(z[None, :], (n, z.shape[0])),
            x,
            method=CVAE.decode_fn,
        )
        return jnp.mean(jnp.exp(y_logvar), axis=1)

    meas = jax.vmap(per_seed)(z_seeds, seeds_x)  # (S, N)
    return jnp.mean(meas, axis=0) ** 3


def optimize_samples(model: CVAE, params, seeds_x, seeds_y, samples,
                     barrier=None, seeds_force=None, iters: int = 5,
                     lr: float = 0.05, kernel_var: float = 1e-3,
                     pdf_weight: float = 12.0):
    """Kernel-repulsion sample optimization (parity: clustering.py:98-161,
    the reference's PREFERRED online-clustering config): Adam on the sample
    positions minimizing  mean kernel(x_i, x_j) - w * mean renorm(pdf(x)) +
    mean barrier(x) — pushes samples toward high-uncertainty regions while
    keeping them spread and inside the workspace."""
    import optax
    from ..ops import renormalize
    from .identify import _encode_seed_z

    z_seeds = _encode_seed_z(model, params, seeds_x, seeds_y, seeds_force)
    d = samples.shape[1]
    inv_var = 1.0 / kernel_var

    def pdf_under_seed(z, sx, pts):
        x = pts - sx[None, :] if model.dx else pts
        _, y_logvar, _ = model.apply(
            params, jnp.broadcast_to(z[None, :], (pts.shape[0], z.shape[0])), x,
            method=CVAE.decode_fn,
        )
        return jnp.max(jnp.exp(y_logvar), axis=1)

    def loss_fn(pts):
        diff = pts[:, None, :] - pts[None, :, :]
        k = jnp.exp(-0.5 * jnp.sum(diff**2, -1) * inv_var)
        # unnormalized Gaussian kernel log-prob normalizer is constant; the
        # reference's MVN log_prob.exp() differs only by that constant scale
        inner = jnp.mean(k)
        total = inner
        pdf_sum = 0.0
        for z, sx in zip(z_seeds, seeds_x):
            pdf_sum = pdf_sum + jnp.mean(renormalize(pdf_under_seed(z, sx, pts)))
        total = total - pdf_weight * pdf_sum
        if barrier is not None:
            total = total + jnp.mean(barrier.batch(pts))
        return total

    opt = optax.adam(lr)

    @jax.jit
    def run(pts):
        opt_state = opt.init(pts)
        def step(carry, _):
            pts, opt_state = carry
            g = jax.grad(loss_fn)(pts)
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(pts, updates), opt_state), None
        (pts, _), _ = jax.lax.scan(step, (pts, opt_state), None, length=iters)
        return pts

    return run(samples)


def reweight_resample(key, samples, weights, num_draws: int):
    """Weighted-to-unweighted resampling (process_clusters :337-344)."""
    idx = jax.random.categorical(
        key, jnp.log(jnp.maximum(weights, 1e-30)), shape=(num_draws,)
    )
    return samples[idx]


def mean_shift(X, bandwidth: float, iters: int = 30):
    """Fixed-iteration flat-kernel mean shift (replaces sklearn MeanShift,
    process_clusters :381-387). X: (N, d). Returns shifted points (N, d)."""
    X = jnp.asarray(X, jnp.float32)

    def body(pts, _):
        d2 = jnp.sum((pts[:, None, :] - X[None, :, :]) ** 2, axis=-1)
        w = (d2 <= bandwidth**2).astype(jnp.float32)
        new = (w @ X) / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)
        return new, None

    return jax.lax.scan(body, X, None, length=iters)[0]


def extract_modes(shifted, bandwidth: float, min_count: int = 10):
    """Collapse converged points into cluster centers + labels (host-side,
    small). Points whose mode attracts < min_count members get label -1
    (parity: MeanShift(cluster_all=False, min_bin_freq=10))."""
    pts = np.asarray(shifted)
    n = pts.shape[0]
    # leader pass over a precomputed distance matrix: each point joins the
    # earliest center within bandwidth/2, else opens a new one. The O(n^2)
    # matrix is one vector op; the sequential pass is O(n) cheap lookups
    # (round 1 called np.linalg.norm per (point, center) pair).
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    close = d2 < (bandwidth / 2) ** 2
    center_idx: list[int] = []
    labels = np.full(n, -1, np.int64)
    for i in range(n):
        if center_idx:
            hits = np.nonzero(close[i, center_idx])[0]
            if hits.size:
                labels[i] = hits[0]
                continue
        center_idx.append(i)
        labels[i] = len(center_idx) - 1
    # refine centers to member means; drop small clusters
    counts = np.bincount(labels, minlength=len(center_idx))
    keep = np.nonzero(counts >= min_count)[0]
    means = [pts[labels == j].mean(0) for j in keep]
    relabel = np.full(len(center_idx), -1, np.int64)
    relabel[keep] = np.arange(len(keep))
    labels = np.where(labels >= 0, relabel[labels], -1)
    return (np.array(means) if means else np.zeros((0, pts.shape[1]))), labels


def merge_overlapping(cluster_means, labels, sq_thresh: float = 0.04):
    """Iteratively drop the most-overlapping center until pairwise squared
    distances exceed the threshold (parity: clustering.py:213-231)."""
    means = np.asarray(cluster_means).copy()
    labels = np.asarray(labels).copy()
    while len(means) > 1:
        n = len(means)
        dists = np.sum((means[None] - means[:, None]) ** 2, 2) + np.eye(n)
        overlap = dists < sq_thresh
        if not overlap.any():
            break
        drop = int(np.argmax(overlap.sum(1)))
        new_labels = np.arange(n)
        new_labels = np.delete(new_labels, drop)
        mapping = {old: new for new, old in enumerate(new_labels)}
        labels = np.array([mapping.get(l, -1) for l in labels])
        means = means[np.arange(n) != drop]
    return means, labels


class ClusterResult(NamedTuple):
    means: np.ndarray  # (K, d)
    labels: np.ndarray  # (M,) -1 for outliers
    points: np.ndarray  # (M, d) resampled points that were clustered
    blank_means: np.ndarray | None  # low-information regions


def find_clusters(
    model: CVAE,
    params,
    seeds_x,
    seeds_y,
    key,
    robot_lim,
    num_pts: int = 1000,
    num_fingerprints: int = 2,
    plot_idx=(0, 1),
    cluster_method: str = "shift",
    cluster_by_plot_idx: bool = True,
    bandwidth: float = 0.25,
    scale: float = 1.0,
    get_blank: bool = False,
    seeds_force=None,
    use_optimize_samples: bool = False,
    barrier=None,
) -> ClusterResult:
    """End-to-end object discovery (parity: clustering.find_clusters).
    ``use_optimize_samples`` enables the kernel-repulsion sample
    optimization the reference's online clusterer runs with (its
    cluster_config sets optimize_samples: True), which keeps candidates
    inside the barrier instead of drifting to unexplored corners."""
    robot_lim = jnp.asarray(robot_lim, jnp.float32)
    k1, k2, k3 = jax.random.split(key, 3)
    samples = jax.random.uniform(
        k1, (num_pts, robot_lim.shape[0]),
        minval=robot_lim[:, 0] * scale, maxval=robot_lim[:, 1] * scale,
    )
    if use_optimize_samples:
        if barrier is not None and hasattr(barrier, "truncate"):
            barrier = barrier.truncate(samples.shape[1])
        samples = optimize_samples(model, params, seeds_x, seeds_y, samples,
                                   barrier=barrier, seeds_force=seeds_force)
        samples = jnp.clip(samples, robot_lim[:, 0], robot_lim[:, 1])
    weights = score_samples(model, params, seeds_x, seeds_y, samples, seeds_force)
    resampled = reweight_resample(k2, samples, weights, num_pts // 2)

    X = resampled[:, jnp.asarray(plot_idx)] if cluster_by_plot_idx else resampled

    if cluster_method == "shift":
        shifted = mean_shift(X, bandwidth)
        means, labels = extract_modes(shifted, bandwidth)
    elif cluster_method == "kmeans":
        from scipy.cluster.vq import kmeans2
        means, labels = kmeans2(np.asarray(X), k=num_fingerprints, minit="points",
                                seed=0)
    elif cluster_method == "gmm":
        from sklearn.mixture import GaussianMixture
        gmm = GaussianMixture(n_components=num_fingerprints,
                              covariance_type="tied", n_init=10).fit(np.asarray(X))
        means, labels = gmm.means_, gmm.predict(np.asarray(X))
    else:
        raise ValueError(f"unknown cluster method {cluster_method!r}")

    means, labels = merge_overlapping(means, labels)

    blank_means = None
    if get_blank:
        inv = -weights + jnp.min(weights) + jnp.max(weights)  # AvoidDist flip
        blanks = reweight_resample(k3, samples, inv, num_pts // 2)
        Xb = blanks[:, jnp.asarray(plot_idx)] if cluster_by_plot_idx else blanks
        shifted_b = mean_shift(Xb, bandwidth)
        blank_means, _ = extract_modes(shifted_b, bandwidth)

    return ClusterResult(
        means=np.asarray(means),
        labels=np.asarray(labels),
        points=np.asarray(X),
        blank_means=blank_means,
    )
