"""Multi-host (pod) training validation — SURVEY.md §5's TPU-native
equivalent of a distributed backend (the reference never launches one:
train.py:15 sets NCCL_DEBUG but nothing initializes NCCL).

Two coordinated CPU processes (4 virtual devices each,
`jax.distributed.initialize` over a localhost coordinator) run the FULL
production `fit()` — config-keyed initialize, `global_batch` stitching
host-local rows into global dp arrays, host-local epoch-end eval, and
process-0-gated checkpoints — and their per-step losses must match a
single-process run on the identical 8-device mesh: the mesh, shardings and
GSPMD partitioning are the same in both topologies, only the collective
transport differs (Gloo cross-process vs shared memory).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from itrx.configs import parse_cli
from itrx.data import synthetic
from itrx.train.loop import fit

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pod_matches_single_process(tmp_path):
    d = synthetic.generate(str(tmp_path / "synthetic"), n_images=24, img_dim=48)
    for split in ("train", "dev", "test"):
        ims = np.load(os.path.join(d, f"{split}_ims.npy"))
        np.save(os.path.join(d, f"{split}_ims.npy"), ims.mean(axis=1))

    # single-process reference on the pytest 8-device mesh; also builds the
    # vocab file the workers then load (no build race between processes)
    cfg = parse_cli([
        "with", "VSE_PP",
        f"data_path={tmp_path}", "data_name=synthetic",
        f"vocab_path={d}/vocab", "vocab_type=json",
        "img_dim=48", "embed_size=32", "word_dim=16",
        "batch_size=24", "num_epochs=2", "val_step=0", "log_step=1",
        "learning_rate=0.003", f"save_path={tmp_path}/runs_single",
        "max_violation=True", "seed=3",
    ])
    state, best_single = fit(cfg)
    ref_losses = []
    with open(os.path.join(cfg["save_dir"], "events.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "Loss" in rec:
                ref_losses.append(rec["Loss"])
    assert len(ref_losses) == 10  # 120 samples / 24 batch * 2 epochs

    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable, os.path.join(_REPO, "tests", "multihost_worker.py"),
                str(i), str(port), str(tmp_path), str(tmp_path / "runs_mh"),
            ],
            cwd=_REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out[-3000:]}"
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r

    # dp-replicated state: both hosts observe identical losses
    np.testing.assert_array_equal(results[0]["losses"], results[1]["losses"])
    # and the pod trajectory matches the single-process mesh
    np.testing.assert_allclose(results[0]["losses"], ref_losses, rtol=1e-6)
    # host-local eval (4-device mesh) reaches the same recalls as the
    # single-process 8-device eval
    assert abs(results[0]["best"] - best_single) < 1e-6, (
        results[0]["best"], best_single,
    )

    # process-0 gating: only worker 0's run dir contains checkpoints
    ckpts = {
        pid: sorted(
            fn
            for root, _, fns in os.walk(tmp_path / "runs_mh" / f"p{pid}")
            for fn in fns
            if fn.endswith(".itrx")
        )
        for pid in (0, 1)
    }
    assert ckpts[0], "primary wrote no checkpoint"
    assert not ckpts[1], f"non-primary wrote checkpoints: {ckpts[1]}"
