#!/usr/bin/env python
"""Multi-seed reproducibility runner.

The reference's paper is a reproducibility study built on 10-seed result
tables (README.md:243-371); the reference repo itself provides no runner —
each seed was launched by hand.  This script trains one method across N
seeds, evaluates each best checkpoint, and writes a variance table
(mean/std/min/max per recall metric) as JSON + a printed summary.

    python scripts/multi_seed.py --seeds 10 -- with SCAN data_name=f30k_precomp ...
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--seed_base", type=int, default=0)
    ap.add_argument("--out", default="multi_seed_results.json")
    ap.add_argument("--eval_split", default="test")
    ap.add_argument("rest", nargs=argparse.REMAINDER,
                    help="-- with METHOD k=v ... (train.py CLI args)")
    args = ap.parse_args()

    cli = [a for a in args.rest if a != "--"]

    from itrx.configs import parse_cli
    from itrx.eval.engine import evalrank_single
    from itrx.train.loop import fit

    rows = []
    for s in range(args.seeds):
        seed = args.seed_base + s
        config = parse_cli(cli + [f"seed={seed}"])
        print(f"===== seed {seed} -> {config['save_dir']} =====")
        fit(config)
        best = os.path.join(config["save_dir"], "model_best.itrx")
        res = evalrank_single(best, split=args.eval_split)
        rows.append(
            {
                "seed": seed,
                "save_dir": config["save_dir"],
                **{
                    k: float(res[k])
                    for k in (
                        "rsum", "i2t_r1", "i2t_r5", "i2t_r10",
                        "t2i_r1", "t2i_r5", "t2i_r10",
                    )
                },
            }
        )

    metrics = ["i2t_r1", "i2t_r5", "i2t_r10", "t2i_r1", "t2i_r5", "t2i_r10", "rsum"]
    table = {}
    for m in metrics:
        vals = np.array([r[m] for r in rows])
        table[m] = {
            "mean": float(vals.mean()),
            "std": float(vals.std()),
            "min": float(vals.min()),
            "max": float(vals.max()),
        }
    out = {"runs": rows, "summary": table}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)

    print("\n===== multi-seed summary =====")
    print(f"{'metric':8s} {'mean':>8s} {'std':>7s} {'min':>8s} {'max':>8s}")
    for m in metrics:
        t = table[m]
        print(f"{m:8s} {t['mean']:8.2f} {t['std']:7.2f} {t['min']:8.2f} {t['max']:8.2f}")
    print(f"written to {args.out}")


if __name__ == "__main__":
    main()
