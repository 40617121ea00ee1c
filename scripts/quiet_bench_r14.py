"""Quiet-window bench capture (round-14 record).

Protocol (the BENCH_quiet_* lineage): each run launches only after BOTH
the 1-minute and 5-minute loadavg drop below 0.4, with >= 7 minutes
between runs so they cannot contaminate each other; per-run loadavgs are
published in the record; the primary fields are the LAST run and the
best-of fields are per-mirror / per-op minima across all runs.

Round-14 fixes (ADVICE r13): the always-true gate condition is gone; a
run that exhausts MAX_WAIT_S without the loadavg settling is LAUNCHED
but FLAGGED (``gate_timed_out`` per run, and excluded from the best-of
fields); a bench invocation that emits no JSON line fails loudly with
its stderr instead of an opaque IndexError.

    python scripts/quiet_bench_r14.py <n_runs> <out_json>
"""
import json
import os
import subprocess
import sys
import time

N_RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/quiet_r14.json"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SETTLE_S = 7 * 60
MAX_WAIT_S = 25 * 60

runs = []
notes = []
timed_out = []
for i in range(N_RUNS):
    deadline = time.time() + MAX_WAIT_S
    time.sleep(SETTLE_S if i > 0 else 60)
    gate_ok = False
    while time.time() < deadline:
        l1, l5, _ = os.getloadavg()
        if l1 < 0.4 and l5 < 0.4:
            gate_ok = True
            break
        time.sleep(20)
    timed_out.append(not gate_ok)
    l1, l5, _ = os.getloadavg()
    notes.append(f"{l1:.2f}/{l5:.2f}" + ("" if gate_ok else " GATE-TIMEOUT"))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_CPUS="32")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        sys.exit(
            f"bench.py emitted no JSON line (rc={p.returncode}).\n"
            f"--- stderr tail ---\n{p.stderr[-4000:]}"
        )
    runs.append(json.loads(lines[-1]))
    runs[-1]["gate_timed_out"] = not gate_ok
    print(f"run {i+1}/{N_RUNS} loadavg {notes[-1]}: "
          f"mirrors {runs[-1]['queries']['baseline_flat_1d_1e7']:.4f}/"
          f"{runs[-1]['queries']['baseline_two_var_1e7']:.4f}/"
          f"{runs[-1]['queries']['baseline_along_dim_3x1e7']:.4f}",
          flush=True)

# best-of over SETTLED runs only; if every run timed out of the gate the
# record says so rather than passing loaded numbers off as quiet ones
settled = [r for r in runs if not r["gate_timed_out"]] or runs
rec = dict(runs[-1])
rec["quiet_runs"] = len(settled)
rec["gate_timeouts"] = sum(timed_out)
rec["mirror_gate_best_of_quiet_runs"] = {
    m: min(r["queries"][m] for r in settled)
    for m in ("baseline_flat_1d_1e7", "baseline_two_var_1e7",
              "baseline_along_dim_3x1e7")
}
rec["mirror_e2e_best_of_quiet_runs"] = {
    m: min(r["mirror_e2e"][m] for r in settled)
    for m in rec["mirror_gate_best_of_quiet_runs"]
}
rec["ops_best_of_quiet_runs"] = {
    q: min(r["ops_queries"][q] for r in settled)
    for q in runs[0]["ops_queries"]
}
rec["suite_best_of_quiet_runs"] = {
    q: min(r["queries"][q] for r in settled)
    for q in runs[0]["queries"]
}
rec["quiet_note"] = (
    f"{len(runs)} runs, {len(settled)} settled (start loadavg "
    "1-min/5-min: " + "; ".join(notes)
    + "; each preceded by a >=7-minute settle with BOTH averages "
    "required < 0.4 before launch; runs that exhausted the "
    f"{MAX_WAIT_S//60}-minute gate are flagged and excluded from "
    "best-of).  Primary fields are the last run; best-of fields are "
    "per-mirror/per-op minima across settled runs.  Round-14 capture."
)
rec["runs"] = runs
with open(OUT, "w") as f:
    json.dump(rec, f, indent=1)
print("wrote", OUT)
