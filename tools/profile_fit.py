"""Per-component decomposition of the full fit step (VERDICT r3 item 4).

Runs bench.build_fit_step under jax.profiler, then attributes every device
event to a train-step component via the jax.named_scope annotations
(trainer._build_train_step: flame_mesh / world_pack / raster / photometric /
regularizers / adam / densify_stats; VJP ops inherit the forward scope under
transpose). The trace's XLA-Op events carry no scope metadata on this
backend, so the join goes through the compiled executable's optimized HLO
text: instruction name -> metadata op_name -> scope. Events without a scope
are bucketed by op family (sort / gather / pallas / other).

Prints per-scope totals + the top ops inside each, writes nothing — the
table goes into BASELINE.md by hand with the trace date.

Usage:  python tools/profile_fit.py [--iters 20]
"""

import argparse
import glob
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SCOPES = ("flame_mesh", "world_pack", "raster", "photometric",
          "regularizers", "adam", "densify_stats")


def classify(name: str, op_names: dict) -> str:
    instr = name.split(" = ")[0].strip().lstrip("%")
    scope_src = op_names.get(instr, "")
    for s in SCOPES:
        # scopes appear as jvp(raster)/..., transpose(jvp(raster))/..., or
        # bare .../raster/... — match the word, not a particular phrasing
        if re.search(rf"\b{s}\b", scope_src):
            return ("(vjp) " + s) if "transpose" in scope_src else s
    low = name.lower()
    if "sort" in low:
        return "(unscoped) sort"
    if "gather" in low or "dynamic-slice" in low or "dynamic_slice" in low:
        return "(unscoped) gather/slice"
    if "custom-call" in low or "rasterize" in low:
        return "(unscoped) pallas"
    return "(unscoped) other"


def hlo_op_names(compiled) -> dict:
    """instruction name -> metadata op_name, from the optimized HLO text."""
    pat = re.compile(r"%?([\w.\-]+) = .*?op_name=\"([^\"]+)\"")
    out = {}
    for line in compiled.as_text().splitlines():
        m = pat.search(line)
        if m:
            out[m.group(1)] = m.group(2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from bench import _enable_compile_cache, build_fit_step

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    step_fn, fixed, state, n_active = build_fit_step()
    bank, cam_in, gt, mask, t = fixed

    # optimized-HLO op_name map for scope attribution
    compiled = step_fn.lower(
        *state, bank, cam_in, gt, mask, t,
        jnp.float32(0.0), jnp.float32(1.0)).compile()
    op_names = hlo_op_names(compiled)
    print(f"{len(op_names)} HLO instructions carry op_name metadata")

    def run(state, n, k0):
        for k in range(n):
            gp, dp, neck, aux, moments = state
            gp, dp, neck, aux, moments, losses, _ = step_fn(
                gp, dp, neck, aux, moments, bank, cam_in, gt, mask, t,
                jnp.float32(0.0), jnp.float32(k0 + k + 1))
            state = (gp, dp, neck, aux, moments)
        np.asarray(losses["total"])
        return state

    state = run(state, 2, 0)  # warmup
    trace_dir = tempfile.mkdtemp(prefix="fit_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        state = run(state, args.iters, 2)
    wall = time.perf_counter() - t0
    print(f"{args.iters} steps in {wall:.3f}s wall "
          f"({args.iters / wall:.2f} it/s incl. relay)")

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    pd = jax.profiler.ProfileData.from_file(max(files, key=os.path.getmtime))
    per_scope = defaultdict(float)
    per_scope_ops = defaultdict(lambda: defaultdict(float))
    line_busy = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            ivs = []
            for ev in line.events:
                scope = classify(ev.name, op_names)
                per_scope[scope] += ev.duration_ns
                per_scope_ops[scope][ev.name] += ev.duration_ns
                ivs.append((ev.start_ns, ev.start_ns + ev.duration_ns))
            if ivs:  # interval-union busy of this line
                ivs.sort()
                busy, cs, ce = 0.0, ivs[0][0], ivs[0][1]
                for s, e in ivs[1:]:
                    if s > ce:
                        busy += ce - cs
                        cs, ce = s, e
                    else:
                        ce = max(ce, e)
                line_busy += busy + (ce - cs)
    total = sum(per_scope.values())
    it = args.iters
    print(f"\ndevice op-sum {total/1e6:.1f} ms over {it} steps "
          f"= {total/1e6/it:.2f} ms/step; XLA-line busy "
          f"{line_busy/1e6/it:.2f} ms/step")
    print(f"{'component':26s} {'ms/step':>8s} {'share':>6s}")
    for scope, ns in sorted(per_scope.items(), key=lambda kv: -kv[1]):
        print(f"{scope:26s} {ns/1e6/it:8.2f} {100*ns/total:5.1f}%")
        for name, ons in sorted(per_scope_ops[scope].items(),
                                key=lambda kv: -kv[1])[:5]:
            print(f"    {ons/1e6/it:7.2f}  {name[:95]}")


if __name__ == "__main__":
    main()
