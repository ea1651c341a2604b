"""Class-parallel distributed gradient matching.

GCond's match loss is a sum of per-class terms
(``Σ_c coeff_c · match(gw_syn_c, gw_real_c)``, reference
``gcond_base.py:156-241``) — embarrassingly parallel over classes.  Here
classes shard across the mesh: every device holds the (small) synthetic
graph and model replicated, computes its classes' real-gradient /
syn-gradient match terms, and the scalar loss ``psum``s over ICI.  Feature
and adjacency tensors of the real graph are replicated in this v1 (node
sharding composes later via :mod:`graphslim_tpu.dist.spmm`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def pad_classes(n_class: int, n_shards: int) -> int:
    return -(-n_class // n_shards) * n_shards


def build_sharded_match(engine, mesh: Mesh, axis: str = "data",
                        feature_mode: str = "replicated"):
    """Return ``match(model_params, feat_syn, adj_syn_norm, key) -> loss``
    with classes sharded over ``mesh``.

    ``engine`` is a :class:`~graphslim_tpu.reduce.cond_base
    .CondensationBase`; padding classes carry coeff 0 and pool count 1 so
    they contribute nothing.

    ``feature_mode='sharded'`` row-shards the real feature matrix over the
    mesh (memory per device ``n·d/S``); each class block's deep feature
    rows are fetched with the cross-shard gather
    (:mod:`graphslim_tpu.dist.gather`) instead of a local ``take`` —
    the real graph's dominant tensor is no longer replicated in the
    matching path.  Labels and the sampling CSR stay replicated (ints;
    orders of magnitude smaller than features).
    """
    n_dev = mesh.shape[axis]
    C = len(engine.classes)
    Cp = pad_classes(C, n_dev)

    pools = np.zeros((Cp, engine.pools.shape[1]), dtype=np.int32)
    pools[:C] = np.asarray(engine.pools)
    counts = np.ones((Cp,), dtype=np.int32)
    counts[:C] = np.asarray(engine.pool_counts)
    masks = np.zeros((Cp, engine.n_syn), dtype=bool)
    masks[:C] = np.asarray(engine.class_masks)
    coeffs = np.zeros((Cp,), dtype=np.float32)
    coeffs[:C] = np.asarray(engine.coeffs)

    pools = jnp.asarray(pools)
    counts = jnp.asarray(counts)
    masks = jnp.asarray(masks)
    coeffs = jnp.asarray(coeffs)

    from graphslim_tpu.reduce.cond_base import match_loss, masked_nll
    from graphslim_tpu.kernels.sample import (neighbor_sample_block,
                                              sampling_key)
    from graphslim_tpu.dist.gather import sharded_row_gather_local

    sample_tables = getattr(engine, "sample_tables", None)

    B = engine.batch
    fanouts = engine.fanouts
    model = engine.model
    features = engine.features
    labels_real = engine.labels_real
    adj_off = engine.adj_off
    self_vals = engine.self_vals
    labels_syn = engine.labels_syn
    dis_metric = engine.args.dis_metric

    n_nodes = features.shape[0]
    rows_per = -(-n_nodes // n_dev)
    if feature_mode == "sharded":
        pad = n_dev * rows_per - n_nodes
        if pad:
            features = jnp.concatenate(
                [features, jnp.zeros((pad, features.shape[-1]),
                                     features.dtype)])
        feat_spec = P(axis)
    else:
        feat_spec = P()

    def local(model_params, feat_syn, adj_syn_norm, keys, pools_l,
              counts_l, masks_l, coeffs_l, feats):
        def body(acc, inputs):
            key, pool, count, mask, coeff = inputs
            k1, k2 = jax.random.split(key)
            slot = jnp.arange(B, dtype=jnp.int32)
            rand = jax.random.randint(k1, (B,), 0,
                                      jnp.maximum(count, 1))
            pos = jnp.where(count <= B, jnp.minimum(slot, count - 1),
                            rand)
            targets = pool[pos]
            valid = (slot < count) | (count > B)
            block = neighbor_sample_block(
                k2, adj_off.indptr, adj_off.col,
                adj_off.values_or_ones(), self_vals, targets, fanouts,
                tables=sample_tables)
            if feature_mode == "sharded":
                # devices scan padded classes in lockstep, so the two
                # collectives inside the gather stay aligned
                feat_deep = sharded_row_gather_local(
                    feats, block.node_ids[0], rows_per, axis)
            else:
                feat_deep = jnp.take(feats, block.node_ids[0], axis=0)
            y = jnp.take(labels_real, targets)

            def loss_real_of(p):
                out = model.apply(p, feat_deep, block)
                return masked_nll(out, y, valid)

            gw_real = jax.lax.stop_gradient(
                jax.grad(loss_real_of)(model_params))

            def loss_syn_of(p):
                out = model.apply(p, feat_syn, adj_syn_norm)
                return masked_nll(out, labels_syn, mask)

            gw_syn = jax.grad(loss_syn_of)(model_params)
            return acc + coeff * match_loss(gw_syn, gw_real, dis_metric), \
                None

        # carry must be marked device-varying for the manual-axes type
        # system (shard_map + scan)
        acc0 = jax.lax.pcast(jnp.float32(0.0), axis, to='varying')
        total, _ = jax.lax.scan(
            body, acc0, (keys, pools_l, counts_l, masks_l, coeffs_l))
        return jax.lax.psum(total, axis)

    smapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis),
                  P(axis), feat_spec),
        out_specs=P())

    def match(model_params, feat_syn, adj_syn_norm, key):
        keys = jax.random.split(sampling_key(key), Cp)
        return smapped(model_params, feat_syn, adj_syn_norm, keys, pools,
                       counts, masks, coeffs, features)

    return match
