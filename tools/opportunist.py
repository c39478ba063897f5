"""Opportunistic measurement driver for the bimodal axon tunnel.

The tunnel flips between ~29 ms and 300+ ms round trips within
minutes; record-class measurements are only meaningful in calm
windows.  This driver loops: probe RTT in a subprocess → if calm, run
the next queued measurement (View #30 record attempts, the interactive
zoom sequence, the 2048² poster) → log everything to
/tmp/opportunist.log + /tmp/opportunist_results.json.

Run detached:  PYTHONPATH=/root/repo:/root/.axon_site \
    nohup python tools/opportunist.py > /tmp/opportunist.out 2>&1 &
Each measurement runs in its OWN subprocess (cold-process semantics
for records; no state leaks between attempts).
"""

import json
import os
import subprocess
import sys
import time

LOG = "/tmp/opportunist.log"
OUT = "/tmp/opportunist_results.json"
ENV = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site")

PROBE = r"""
import time, numpy as np, jax, jax.numpy as jnp
jax.devices()
f = jax.jit(lambda x: x + 1)
x = jnp.zeros((8,128), jnp.float32)
f(x).block_until_ready()
ts = []
for _ in range(10):
    t0 = time.perf_counter(); np.asarray(f(x)); ts.append(time.perf_counter()-t0)
print(int(sorted(ts)[5]*1000))
"""

results = {"records": [], "zoomseq": None, "poster": None}


def log(msg):
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    with open(LOG, "a") as f:
        f.write(line + "\n")


def save():
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def probe_rtt() -> int:
    try:
        r = subprocess.run([sys.executable, "-c", PROBE], env=ENV,
                           capture_output=True, text=True, timeout=180,
                           cwd="/root/repo")
        return int(r.stdout.strip().splitlines()[-1])
    except Exception:  # noqa: BLE001
        return 9999


def run_record() -> dict | None:
    r = subprocess.run(
        [sys.executable, "-c", "exec(open('tools/run_view30.py').read())"],
        env=ENV, capture_output=True, text=True, timeout=420,
        cwd="/root/repo")
    try:
        d = json.loads(r.stdout.strip().splitlines()[-1])
        return {k: d.get(k) for k in ("orbit_s", "la_build_s",
                                      "render_s", "total_s",
                                      "iter_sum")}
    except Exception:  # noqa: BLE001
        return None


def run_tool(path, timeout) -> str:
    r = subprocess.run(
        [sys.executable, "-c", f"exec(open('{path}').read())"],
        env=ENV, capture_output=True, text=True, timeout=timeout,
        cwd="/root/repo")
    return (r.stdout + r.stderr)[-2000:]


def main():
    record_budget = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    deadline = time.time() + 6 * 3600
    want_zoomseq = os.path.exists("tools/zoomseq_view30.py")
    while time.time() < deadline and (
            record_budget > 0 or want_zoomseq):
        rtt = probe_rtt()
        log(f"rtt {rtt} ms")
        if rtt > 45:
            time.sleep(240)
            continue
        if record_budget > 0:
            d = run_record()
            log(f"record: {d}")
            if d and d.get("iter_sum") == 351206692131:
                results["records"].append(d)
                save()
            record_budget -= 1
        elif want_zoomseq:
            out = run_tool("tools/zoomseq_view30.py", 900)
            results["zoomseq"] = out
            log(f"zoomseq: {out[-400:]}")
            want_zoomseq = False
            save()
        time.sleep(20)
    log("done")
    save()


if __name__ == "__main__":
    main()
