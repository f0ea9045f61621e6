"""End-to-end overfit tests: train on the synthetic dataset, recall must rise;
checkpoint round-trips through the offline eval CLI path."""

import os

import numpy as np
import pytest

from itrx.configs import parse_cli
from itrx.data import synthetic
from itrx.eval.engine import evalrank_single
from itrx.train.loop import fit


@pytest.fixture(scope="module")
def flat_synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    d = synthetic.generate(str(root / "synthetic"), n_images=24, img_dim=48)
    for split in ("train", "dev", "test"):
        ims = np.load(os.path.join(d, f"{split}_ims.npy"))
        np.save(os.path.join(d, f"{split}_ims.npy"), ims.mean(axis=1))
    return d


def test_vsepp_overfits_and_checkpoints(flat_synth):
    root = os.path.dirname(flat_synth)
    cfg = parse_cli(
        [
            "with", "VSE_PP",
            f"data_path={root}", "data_name=synthetic",
            f"vocab_path={flat_synth}/vocab", "vocab_type=json",
            "img_dim=48", "embed_size=32", "word_dim=16",
            "batch_size=24", "num_epochs=4", "val_step=0",
            "learning_rate=0.003", f"save_path={root}/runs",
            "max_violation=True", "seed=3",
        ]
    )
    state, best_rsum = fit(cfg)
    # random recall on 6 dev images (30 caps): r1 ~ 1/6; trained must beat it
    assert best_rsum > 250, f"model failed to learn: rsum={best_rsum}"

    # offline eval from the written checkpoint (rebuilds model from config)
    best = os.path.join(cfg["save_dir"], "model_best.itrx")
    assert os.path.exists(best)
    res = evalrank_single(best, split="test")
    assert res["rsum"] > 150


def test_resume_restores_progress(flat_synth):
    root = os.path.dirname(flat_synth)
    args = [
        "with", "VSE_PP",
        f"data_path={root}", "data_name=synthetic",
        f"vocab_path={flat_synth}/vocab", "vocab_type=json",
        "img_dim=48", "embed_size=32", "word_dim=16",
        "batch_size=24", "num_epochs=2", "val_step=0",
        "learning_rate=0.003", f"save_path={root}/runs2", "seed=5",
    ]
    cfg = parse_cli(args)
    state, best1 = fit(cfg)
    ckpt = os.path.join(cfg["save_dir"], "epo1_checkpoint.itrx")
    assert os.path.exists(ckpt)

    cfg2 = parse_cli(args + [f"resume={ckpt}", "num_epochs=3"])
    state2, best2 = fit(cfg2)
    assert best2 >= best1 - 1e-6


def test_prefetch_propagates_producer_errors():
    from itrx.train.loop import prefetch

    def bad_iter():
        yield {"x": np.zeros(2)}
        raise RuntimeError("loader exploded")

    it = prefetch(bad_iter())
    next(it)
    with pytest.raises(RuntimeError, match="loader exploded"):
        next(it)
