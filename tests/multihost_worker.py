"""Subprocess worker for tests/test_multihost.py — one simulated pod host.

Run as `python tests/multihost_worker.py <process_id> <port> <data_root>
<save_path>`.  Each worker gets 4 virtual CPU devices; two coordinated
workers form the same 8-device dp mesh the in-process single-host reference
run uses, so losses must agree.  Not collected by pytest (no test_ prefix).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    pid, port, root, save_path = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4],
    )
    from itrx.configs import parse_cli
    from itrx.train.loop import fit

    cfg = parse_cli([
        "with", "VSE_PP",
        f"data_path={root}", "data_name=synthetic",
        f"vocab_path={root}/synthetic/vocab", "vocab_type=json",
        "img_dim=48", "embed_size=32", "word_dim=16",
        "batch_size=24", "num_epochs=2", "val_step=0", "log_step=1",
        "learning_rate=0.003", f"save_path={save_path}/p{pid}",
        "max_violation=True", "seed=3",
        f"coordinator_address=localhost:{port}",
        "num_processes=2", f"process_id={pid}",
    ])
    state, best = fit(cfg)

    log_dir = (
        cfg["save_dir"] if pid == 0
        else os.path.join(cfg["save_dir"], f"worker{pid}")
    )
    losses = []
    with open(os.path.join(log_dir, "events.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if "Loss" in d:
                losses.append(d["Loss"])
    print(
        "RESULT " + json.dumps({"pid": pid, "best": float(best), "losses": losses}),
        flush=True,
    )


if __name__ == "__main__":
    main()
