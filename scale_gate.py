"""Quiet-window-gated scaling sample: probe the machine ceiling first
(engine workload, Ray-free, ~15 s); only launch the full bench.py
--scaling sample when the probe says the host can express >= MIN_RATIO
speedup at 4->16 procs. Re-probes every WAIT seconds otherwise, up to
MAX_TRIES. This is the documented methodology (VERDICT r4 item 6:
sample in the quietest windows; never co-run Ray work)."""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.dirname(os.path.abspath(__file__)))

import importlib.util

spec = importlib.util.spec_from_file_location("benchmod", os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench.py"))
benchmod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(benchmod)

MIN_RATIO = float(os.environ.get("GATE_MIN_RATIO", "2.3"))
WAIT = int(os.environ.get("GATE_WAIT_SEC", "180"))
MAX_TRIES = int(os.environ.get("GATE_MAX_TRIES", "8"))
# GATE_LOOP > 1 banks several gated samples in one detached run; each
# sample re-gates from scratch (MAX_TRIES probes), and a cool-down WAIT
# separates samples so back-to-back runs don't share a warm window.
LOOP = int(os.environ.get("GATE_LOOP", "1"))

taken = 0
for sample_no in range(1, LOOP + 1):
    opened = False
    for attempt in range(1, MAX_TRIES + 1):
        probe = benchmod._machine_ceiling(4, 16, 2_000_000)
        print(f"[sample {sample_no}] gate probe {attempt}: {probe}", flush=True)
        if probe["machine_ceiling_ratio"] >= MIN_RATIO:
            print(f"[sample {sample_no}] gate OPEN — launching sample", flush=True)
            env = dict(os.environ, SCALE_LO="4", SCALE_HI="16")
            rc = subprocess.call([sys.executable, "bench.py", "--scaling"], env=env)
            print(f"[sample {sample_no}] exit {rc}", flush=True)
            taken += rc == 0
            opened = True
            break
        print(f"[sample {sample_no}] gate closed (ratio {probe['machine_ceiling_ratio']} < {MIN_RATIO}); wait {WAIT}s", flush=True)
        time.sleep(WAIT)
    if not opened:
        print(f"[sample {sample_no}] gate never opened; no sample taken", flush=True)
    if sample_no < LOOP:
        time.sleep(WAIT)
print(f"done: {taken}/{LOOP} samples taken", flush=True)
