#!/usr/bin/env python
"""Training CLI.

Same surface as the reference (train.py:20-72 + sacred):

    python train.py with SCAN data_name=f30k_precomp data_path=/data max_violation=True

Named configs: VSE_PP, SCAN, VSRN, SAEM, SGRAF, CAMERA.
"""

import logging
import sys

from itrx.configs import parse_cli
from itrx.train.loop import fit
from itrx.utils.logging import second2DHM  # noqa: F401  (parity export)


def main(argv):
    logging.basicConfig(format="%(asctime)s %(message)s", level=logging.INFO)
    config = parse_cli(argv)
    print("".center(120, "-"))
    for i, (k, v) in enumerate(sorted(config.items())):
        print(f"{k}: {v}".center(40, " "), end="\n" if i % 3 == 2 else "")
    print()
    print("".center(120, "-"))
    state, best_rsum = fit(config)
    print(f"Training done. best rsum = {best_rsum:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
