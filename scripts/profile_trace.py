"""Per-op device profile of any sim step via jax.profiler (round 5).

jax.profiler.trace WORKS through the axon tunnel (round-5 discovery) and
is the ONLY timing instrument on this runtime that needs no elision
workarounds: it reports per-HLO device durations directly.  This script
traces a few steps of a config, joins the trace with the optimized HLO's
source metadata, and prints a per-source-line cost table (the basis of
docs/PERF.md round-5 tables).

Usage (real TPU):  python scripts/profile_trace.py [n [steps]]
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from waterlily_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

TRACE_DIR = "/tmp/wl_trace"


def capture(n=256, steps=5):
    from waterlily_tpu.models.cases import sphere_3d
    sim = sphere_3d(n=n, m=n, Re=3700, dtype=jnp.float32)
    hlo = sim._step_static.lower(sim.flow, sim.levels).compile().as_text()
    sim.steps(12, remeasure=False)
    jax.block_until_ready(sim.flow.u)
    with jax.profiler.trace(TRACE_DIR):
        sim.steps(steps, remeasure=False)
        jax.block_until_ready(sim.flow.u)
    traces = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))
    return hlo, traces[-1]


def hlo_metadata(hlo_text):
    meta = {}
    pat = re.compile(r"%([\w.\-]+) = (.*)")
    mpat = re.compile(r'op_name="([^"]*)"')
    spat = re.compile(r'source_file="([^"]*)" source_line=(\d+)')
    for line in hlo_text.splitlines():
        m = pat.match(line.strip())
        if not m:
            continue
        name, rest = m.groups()
        om, sm = mpat.search(line), spat.search(line)
        src = (f"{sm.group(1).split('/')[-1]}:{sm.group(2)}" if sm else "")
        meta[name] = (om.group(1) if om else "", src, rest[:80])
    return meta


def exclusive_times(trace_path):
    """Per-op device-exclusive durations (while envelopes subtract their
    bodies; the jit envelope lives on its own track and is dropped)."""
    with gzip.open(trace_path) as f:
        events = json.load(f)["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [e for e in events
           if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], "")
           and not e["name"].startswith("jit_")]
    dev.sort(key=lambda e: (e["ts"], -e["dur"]))
    stack = []
    for e in dev:
        while stack and stack[-1]["ts"] + stack[-1]["dur"] <= e["ts"]:
            stack.pop()
        if stack:
            stack[-1]["_ct"] = stack[-1].get("_ct", 0.0) + e["dur"]
        stack.append(e)
    agg, cnt = collections.Counter(), collections.Counter()
    for e in dev:
        agg[e["name"]] += e["dur"] - e.get("_ct", 0.0)
        cnt[e["name"]] += 1
    return agg, cnt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    hlo, trace = capture(n, steps)
    meta = hlo_metadata(hlo)
    agg, cnt = exclusive_times(trace)
    total = sum(agg.values())
    print(f"device total: {total/steps/1e3:.2f} ms/step "
          f"({len(agg)} distinct ops, trace {trace})\n")
    cat, catn = collections.Counter(), collections.Counter()
    for name, us in agg.items():
        m = meta.get(name)
        key = (m[1] or m[0][:40]) if m and (m[0] or m[1]) else \
            "UNRESOLVED:" + name.split(".")[0]
        cat[key] += us
        catn[key] += cnt[name]
    print(f"{'ms/step':>8} {'evs/step':>9}  source")
    for key, us in cat.most_common(30):
        print(f"{us/steps/1e3:8.3f} {catn[key]/steps:9.1f}  {key}")


if __name__ == "__main__":
    main()
