"""KMeans (Lloyd's) in pure JAX — vmappable, jitted per (n, k) shape.

Replaces scikit-learn KMeans/BisectingKMeans usage (reference
``coarsening/clustering.py:5``, ``coarsening/vng.py:5``,
``dataset/loader.py:339-372``).  Bisecting K-means and vanilla K-means
serve the same role here (cluster centroids as synthetic features); we run
Lloyd with random-point init and empty-cluster preservation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(2, 3))
def kmeans(key: jax.Array, x: jax.Array, k: int, iters: int = 30,
           weights: jax.Array | None = None,
           init: jax.Array | None = None
           ) -> tuple[jax.Array, jax.Array]:
    """Return (centroids [k, d], assignment [n]).

    ``init`` warm-starts Lloyd from given centroids (evolving-clustering
    path, reference ``condensation/gecc.py:687-800``); otherwise random
    points initialize.
    """
    n = x.shape[0]
    if init is not None:
        centroids = init
    else:
        idx = jax.random.choice(key, n, shape=(k,), replace=False)
        centroids = jnp.take(x, idx, axis=0)
    w = jnp.ones((n,)) if weights is None else weights

    def step(centroids, _):
        d2 = (jnp.sum(x * x, 1)[:, None] + jnp.sum(centroids * centroids,
                                                   1)[None, :]
              - 2.0 * x @ centroids.T)
        assign = jnp.argmin(d2, axis=1)
        wsum = jax.ops.segment_sum(w, assign, num_segments=k)
        csum = jax.ops.segment_sum(x * w[:, None], assign, num_segments=k)
        new = csum / jnp.maximum(wsum, 1e-12)[:, None]
        # keep previous centroid for empty clusters
        new = jnp.where((wsum > 0)[:, None], new, centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    d2 = (jnp.sum(x * x, 1)[:, None] + jnp.sum(centroids * centroids,
                                               1)[None, :]
          - 2.0 * x @ centroids.T)
    return centroids, jnp.argmin(d2, axis=1)


@functools.partial(jax.jit, static_argnums=(3,))
def incremental_kmeanspp(key: jax.Array, x: jax.Array,
                         old_centers: jax.Array, needed: int) -> jax.Array:
    """Pick ``needed`` new centroids from ``x`` by D² (kmeans++) sampling
    seeded with the distance to existing ``old_centers``.

    The evolving-clustering primitive of reference
    ``condensation/gecc.py:1005-1065`` (``incremental_kmeanspp_init``),
    as one jitted ``lax.scan`` instead of a Python cumulative-sum walk.
    ``old_centers`` may be empty ([0, d]) — the first pick is then uniform
    (the reference's infinite-distance convention).
    """
    n = x.shape[0]
    x2 = jnp.sum(x * x, axis=1)
    if old_centers.shape[0] > 0:
        d2 = (x2[:, None] + jnp.sum(old_centers * old_centers, 1)[None, :]
              - 2.0 * x @ old_centers.T)
        nearest = jnp.maximum(jnp.min(d2, axis=1), 0.0)
    else:
        nearest = jnp.ones((n,), dtype=x.dtype)   # uniform first pick

    def pick(carry, k):
        nearest, = carry
        total = jnp.sum(nearest)
        # D² sampling; degenerate (all-zero) distances fall back to uniform
        logits = jnp.where(total > 1e-12,
                           jnp.log(jnp.maximum(nearest, 1e-30)),
                           jnp.zeros_like(nearest))
        idx = jax.random.categorical(k, logits)
        center = x[idx]
        dn = jnp.maximum(x2 + jnp.sum(center * center)
                         - 2.0 * (x @ center), 0.0)
        return (jnp.minimum(nearest, dn),), center

    _, new_centers = jax.lax.scan(pick, (nearest,),
                                  jax.random.split(key, needed))
    return new_centers
