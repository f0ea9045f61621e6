#!/usr/bin/env python
"""Evaluation launcher (ref test.py:1-20).

    python test.py single /path/to/model_best.itrx [--split testall] [--fold5] [--data_path P]
    python test.py ensemble ckpt1 ckpt2 [--split testall] [--fold5]
"""

import argparse

from itrx.eval.engine import evalrank_ensemble, evalrank_single


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["single", "ensemble"])
    ap.add_argument("model_path")
    ap.add_argument("model_path2", nargs="?", default=None)
    ap.add_argument("--split", default="test")
    ap.add_argument("--fold5", action="store_true")
    ap.add_argument("--data_path", default=None)
    args = ap.parse_args()

    if args.mode == "single":
        evalrank_single(
            args.model_path, data_path=args.data_path, split=args.split,
            fold5=args.fold5,
        )
    else:
        if not args.model_path2:
            ap.error("ensemble mode needs two checkpoint paths")
        evalrank_ensemble(
            args.model_path, args.model_path2, data_path=args.data_path,
            split=args.split, fold5=args.fold5,
        )


if __name__ == "__main__":
    main()
