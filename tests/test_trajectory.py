"""SFGC / GEOM / GECC tests."""

import os

import numpy as np
import pytest

from graphslim_tpu.config import Args, finalize
from graphslim_tpu.eval import Evaluator
from graphslim_tpu.reduce import create_reducer


def _args(tmp_path, method, **kw):
    base = dict(dataset="synth-small", method=method,
                save_path=str(tmp_path), epochs=6, eval_epochs=50,
                run_eval=2, run_inter_eval=1, teacher_epochs=100,
                expert_epochs=50, syn_steps=25, num_experts=3,
                lr_student=0.2, lr_teacher=0.4, lr_feat=0.001,
                start_epoch=30, optim="SGD", lam=0.75, T=100,
                max_start_epoch_s=30, max_start_epoch=50,
                min_start_epoch=0)
    base.update(kw)
    return finalize(Args(**base), explicit=set(base))


@pytest.mark.slow
def test_sfgc_e2e(tmp_path, synth_dataset):
    ds = synth_dataset
    args = _args(tmp_path, "sfgc")
    red = create_reducer("sfgc", ds, args).reduce(ds)
    assert red.adj is None  # structure-free
    (mean, _), _ = Evaluator(ds, args).evaluate(red, "GCN")
    assert mean > 0.7, mean
    # buffer cached on disk and reused with --no_buff
    buf_dir = os.path.join(str(tmp_path), "sfgc_buffer")
    assert os.path.isdir(buf_dir) and os.listdir(buf_dir)
    args2 = _args(tmp_path, "sfgc", no_buff=True, epochs=2)
    red2 = create_reducer("sfgc", ds, args2).reduce(ds)
    assert red2.n_syn == red.n_syn


def test_sfgc_buffer_shape(tmp_path, synth_dataset):
    ds = synth_dataset
    args = _args(tmp_path, "sfgc", teacher_epochs=50, num_experts=2)
    agent = create_reducer("sfgc", ds, args)
    traj = agent.build_buffer(ds, False)
    assert traj.shape[0] == 2
    assert traj.shape[1] == 50 // 10 + 1  # init + every 10th epoch
    assert traj.shape[2] == agent.n_params
    # trajectories move away from init
    d01 = np.linalg.norm(traj[0, -1] - traj[0, 0])
    assert d01 > 0.1


@pytest.mark.parametrize("soft", [0, 1])
@pytest.mark.slow
def test_geom_e2e(tmp_path, synth_dataset, soft):
    ds = synth_dataset
    args = _args(tmp_path, "geom", soft_label=soft, beta=0.01,
                 optim_lr=1, lr_y=5e-5)
    red = create_reducer("geom", ds, args).reduce(ds)
    labels = np.asarray(red.labels)
    if soft:
        assert labels.ndim == 2
        np.testing.assert_allclose(labels.sum(1), np.ones(len(labels)),
                                   rtol=1e-4)
    (mean, _), _ = Evaluator(ds, args).evaluate(red, "GCN")
    assert mean > 0.7, mean


@pytest.mark.parametrize("fuzz", [1.0, 1.3])
def test_gecc(tmp_path, synth_dataset, fuzz):
    ds = synth_dataset
    args = finalize(Args(dataset="synth-small", method="gecc",
                         save_path=str(tmp_path), eval_epochs=50,
                         run_eval=2, fuzziness=fuzz, depth=2),
                    explicit={"eval_epochs", "run_eval", "fuzziness",
                              "depth"})
    red = create_reducer("gecc", ds, args).reduce(ds)
    assert np.isfinite(np.asarray(red.feat)).all()
    (mean, _), _ = Evaluator(ds, args).evaluate(red, "GCN")
    assert mean > 0.8, (fuzz, mean)


def test_evolving_matches_batch_quality():
    """Evolving clustering over two partitions reaches batch-clustering
    quality (reference gecc.py:687-1065 incremental kmeans++ + warm
    start): partition A sees 5 of 8 blobs, partition B adds the rest;
    the evolved centroids' SSE on the union must match a batch k-means."""
    import jax
    import jax.numpy as jnp
    from graphslim_tpu.kernels.kmeans import incremental_kmeanspp, kmeans

    rng = np.random.default_rng(0)
    blobs = [rng.normal(size=(60, 6)).astype(np.float32) + 10 * c
             for c in range(8)]
    xA = jnp.asarray(np.concatenate(blobs[:5]))
    xB = jnp.asarray(np.concatenate(blobs))          # second split: all 8
    x_all = xB

    cA, _ = kmeans(jax.random.key(0), xA, 5)
    new = incremental_kmeanspp(jax.random.key(1), xB, cA, 3)
    warm = jnp.concatenate([cA, new], axis=0)
    cE, _ = kmeans(jax.random.key(2), xB, 8, init=warm)
    cBatch, _ = kmeans(jax.random.key(3), x_all, 8)

    def sse(centers):
        d2 = (jnp.sum(x_all * x_all, 1)[:, None]
              + jnp.sum(centers * centers, 1)[None, :]
              - 2.0 * x_all @ centers.T)
        return float(jnp.sum(jnp.min(d2, axis=1)))

    assert sse(cE) <= 1.2 * sse(cBatch), (sse(cE), sse(cBatch))


def test_gecc_evolves_across_splits(tmp_path, synth_dataset):
    """prev_centroids from split 1 warm-start split 2; budgets that grow
    are filled by incremental kmeans++ (no crash, finite, sane eval)."""
    from graphslim_tpu.reduce.gecc import GECC

    ds = synth_dataset
    args = finalize(Args(dataset="synth-small", method="gecc",
                         save_path=str(tmp_path), eval_epochs=50,
                         run_eval=2, reduction_rate=0.05, depth=2),
                    explicit={"eval_epochs", "run_eval",
                              "reduction_rate", "depth"})
    r1 = GECC(ds, args)
    red1 = r1.reduce(ds, verbose=False)
    # split 2: bigger budget -> extend path (incremental kmeans++)
    args2 = finalize(Args(dataset="synth-small", method="gecc",
                          save_path=str(tmp_path), eval_epochs=50,
                          run_eval=2, reduction_rate=0.1, depth=2),
                     explicit={"eval_epochs", "run_eval",
                               "reduction_rate", "depth"})
    r2 = GECC(ds, args2, prev_centroids=r1.prev_centroids)
    red2 = r2.reduce(ds, verbose=False)
    assert red2.feat.shape[0] > red1.feat.shape[0]
    assert np.isfinite(np.asarray(red2.feat)).all()
    # split 3: shrinking budget -> truncate path
    r3 = GECC(ds, args, prev_centroids=r2.prev_centroids)
    red3 = r3.reduce(ds, verbose=False)
    assert red3.feat.shape[0] == red1.feat.shape[0]
    (mean, _), _ = Evaluator(ds, args2).evaluate(red2, "GCN")
    assert mean > 0.75, mean


@pytest.mark.slow
def test_gecc_sampled_aggregation_oracle(tmp_path, synth_dataset):
    """With fanout >= max degree the sampled hop-mix estimate equals the
    exact ELL hop mix (every neighbor is sampled, weights normalized)."""
    import jax.numpy as jnp
    from graphslim_tpu.reduce.gecc import GECC

    ds = synth_dataset
    args = finalize(Args(dataset="synth-small", method="gecc",
                         save_path=str(tmp_path), depth=2),
                    explicit={"depth"})
    agent = GECC(ds, args)
    max_deg = int(np.diff(np.asarray(ds.adj.indptr)).max())
    agent.sample_fanout = max_deg + 1
    train_rows = np.asarray(ds.idx_train)
    sampled = np.asarray(agent._aggregate_sampled(ds, train_rows))
    exact = np.asarray(jnp.take(agent._aggregate(ds),
                                jnp.asarray(train_rows), axis=0))
    np.testing.assert_allclose(sampled, exact, rtol=2e-2, atol=2e-2)
