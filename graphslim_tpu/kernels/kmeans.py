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
           weights: jax.Array | None = None
           ) -> tuple[jax.Array, jax.Array]:
    """Return (centroids [k, d], assignment [n])."""
    n = x.shape[0]
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
