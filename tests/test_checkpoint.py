"""Training-state checkpoint/resume for condensation."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from graphslim_tpu.checkpoint import save_state, load_state
from graphslim_tpu.config import Args, finalize
from graphslim_tpu.reduce import create_reducer


def test_save_load_roundtrip(tmp_path):
    state = ({"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))},
             jnp.arange(4.0), None)
    path = str(tmp_path / "s.npz")
    save_state(path, state, epoch=7)
    template = ({"w": jnp.zeros((3, 2)), "b": jnp.ones((2,))},
                jnp.zeros(4), None)
    loaded, epoch = load_state(path, template)
    assert epoch == 7
    np.testing.assert_allclose(np.asarray(loaded[0]["w"]), np.ones((3, 2)))
    np.testing.assert_allclose(np.asarray(loaded[1]), np.arange(4.0))
    assert loaded[2] is None
    # structure mismatch → rejected
    bad, e = load_state(path, ({"w": jnp.zeros((5, 2))},))
    assert bad is None and e == 0


@pytest.mark.slow
def test_gcond_resume(tmp_path, synth_dataset):
    ds = synth_dataset
    base = dict(dataset="synth-small", method="gcond",
                save_path=str(tmp_path), epochs=3, outer_loop=2,
                inner_loop=1, eval_epochs=40, run_eval=2,
                run_inter_eval=1, lr_feat=0.01, lr_adj=0.01,
                condense_model="SGC")
    args = finalize(Args(**base), explicit=set(base))
    agent = create_reducer("gcond", ds, args)
    agent.reduce(ds)
    ckpt = agent._state_ckpt_path()
    assert os.path.exists(ckpt)
    # resume with more epochs: continues from saved epoch
    args2 = finalize(Args(**{**base, "epochs": 5, "resume": True}),
                     explicit=set(base) | {"resume"})
    agent2 = create_reducer("gcond", ds, args2)
    red = agent2.reduce(ds)
    assert np.isfinite(np.asarray(red.feat)).all()
