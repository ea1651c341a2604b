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
