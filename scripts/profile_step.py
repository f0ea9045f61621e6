"""Profile one method's train step on the TPU and summarize the hot ops.

Usage: python scripts/profile_step.py METHOD [k=v ...] [--top=N]

Runs the method's train step (same shapes as scripts/train_bench.py) a few
times under jax.profiler.trace, then parses the Chrome trace directly
(/tmp/jaxprof/**/vm.trace.json.gz — the tensorboard converter dies on this
environment's protobuf), aggregating device-lane event durations by op name.

Summarize an existing trace without touching the TPU:
    python scripts/profile_step.py --parse-only [--top=N]
"""

import gzip
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/jaxprof"


def summarize(top_n: int = 30, steps: int = 1):
    paths = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/vm.trace.json.gz"))
    if not paths:
        print("no trace found under", TRACE_DIR)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU/device; fall back to
    # lanes that carry 'run_id' args (XLA executable events)
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items() if "TPU" in n or "/device" in n.lower()}
    totals, counts, longest = {}, {}, {}
    total_dev = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        args = e.get("args") or {}
        # keep only XLA op events (they carry long_name); skip the jit_*
        # envelope spans and bare step-number marker lanes, which would
        # double-count the whole step
        if "long_name" not in args and (
            name.startswith("jit_") or name.isdigit()
        ):
            continue
        key = args.get("long_name", name)[:160]
        dur = e["dur"] / 1e3  # us -> ms
        totals[name] = totals.get(name, 0.0) + dur
        counts[name] = counts.get(name, 0) + 1
        if dur >= longest.get(name, (0.0, ""))[0]:
            longest[name] = (dur, key)
        total_dev += dur
    print(f"trace: {paths[-1]}")
    print(f"device-lane total: {total_dev:.1f} ms over {steps} steps "
          f"({total_dev / max(steps, 1):.2f} ms/step)\n")
    print(f"{'ms/step':>9}  {'%':>5}  {'n':>5}  name")
    for name, tot in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{tot / max(steps, 1):9.3f}  {100 * tot / total_dev:5.1f}  "
              f"{counts[name]:5d}  {name}")
        ln = longest[name][1]
        if ln and ln != name:
            print(f"{'':23}{ln}")


def main():
    argv = [a for a in sys.argv[1:]]
    top_n = 30
    for a in list(argv):
        if a.startswith("--top="):
            top_n = int(a.split("=")[1])
            argv.remove(a)
    if "--parse-only" in argv:
        summarize(top_n)
        return

    import numpy as np
    import jax

    import scripts.train_bench as tb  # noqa: F401  (reuse its shapes)
    from itrx.models import get_model
    from itrx.train.loop import make_train_step
    from itrx.train.state import create_train_state
    from itrx.utils.profiling import device_sync

    which = argv[0]
    overrides = {k: tb._parse(v) for k, v in
                 (a.split("=", 1) for a in argv[1:])}

    cfg, batch = tb.method_config(which)
    cfg.update(overrides)
    for k, v in dict(learning_rate=2e-4, lr_update=15, grad_clip=2.0,
                     seed=0).items():
        cfg.setdefault(k, v)
    model = get_model(cfg)
    state, tx = create_train_state(model, cfg, batch, 100)
    step = make_train_step(
        model, tx,
        compute_dtype="bfloat16" if cfg.get("train_bf16") else None,
    )
    r = jax.random.PRNGKey(0)
    state, aux = step(state, batch, r, 0)
    device_sync(aux["Loss"])  # compile + warm
    state, aux = step(state, batch, r, 0)
    device_sync(aux["Loss"])

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    n_steps = 3
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(n_steps):
        state, aux = step(state, batch, r, 0)
    device_sync(aux["Loss"])
    jax.profiler.stop_trace()
    summarize(top_n, steps=n_steps)


if __name__ == "__main__":
    main()
