"""Cold-process compile-cache regression probe (VERDICT r04 item 8).

The driver's bench capture runs `python bench.py` in a FRESH session: the
persistent compile cache only helps if (a) it lives on a volume that survives
session teardown (repo-local `.jax_cache_tpu`, not /tmp — BENCH_r04's driver
run paid a 181.6 s mtgp compile that the builder had already cached under
/tmp) and (b) the cached keys match the FINAL committed code (any edit to
traced code changes the HLO fingerprint and misses).

This probe runs selected bench configs TWICE, each in a fresh subprocess
(same invocation shape as bench.py's own children), and asserts the second
run's `est_compile_s` collapses.  Run it as the LAST TPU action after code
freeze; if it fails, the driver's capture will pay full cold compiles.

Usage:  python scripts/cache_probe.py [config ...]   (default: mtgp)
Writes one JSON line per run to stdout and /tmp/cache_probe.jsonl.
"""

import json
import subprocess
import sys
import time

REPO = "/root/repo"
# generous compile allowance: tunnel weather has produced 38 s vs 412 s
# compiles for identical programs (CLAUDE.md) — the warm assertion is about
# CACHE hits, so the threshold only needs to exclude a full recompile
WARM_COMPILE_MAX_S = 30.0


def run_config(name: str, budget: float) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, f"{REPO}/bench.py", name, f"{budget:.0f}"],
        capture_output=True, text=True, timeout=budget + 300.0, cwd=REPO,
    )
    lines = [json.loads(ln) for ln in proc.stdout.splitlines()
             if ln.startswith("{")]
    finals = [ln for ln in lines
              if not ln.get("extra", {}).get("provisional")
              and not ln["metric"].startswith("FAILED")]
    return {
        "config": name,
        "rc": proc.returncode,
        "wall_s": round(time.time() - t0, 1),
        "lines": finals,
        "stderr_tail": proc.stderr[-300:] if proc.returncode else "",
    }


def main():
    configs = sys.argv[1:] or ["mtgp"]
    ok = True
    for name in configs:
        results = []
        for attempt in ("cold_or_warm", "must_be_warm"):
            r = run_config(name, budget=420.0)
            r["attempt"] = attempt
            compiles = [ln["extra"].get("est_compile_s")
                        for ln in r["lines"]
                        if "est_compile_s" in ln.get("extra", {})]
            r["est_compile_s"] = compiles
            results.append(r)
            print(json.dumps({k: r[k] for k in
                              ("config", "attempt", "rc", "wall_s",
                               "est_compile_s")}), flush=True)
            with open("/tmp/cache_probe.jsonl", "a") as fh:
                fh.write(json.dumps(r) + "\n")
            time.sleep(20)  # let the old process release the chip
        second = results[1]
        if second["rc"] != 0 or not second["est_compile_s"]:
            print(f"# {name}: second run failed / no telemetry", flush=True)
            ok = False
        elif max(second["est_compile_s"]) > WARM_COMPILE_MAX_S:
            print(f"# {name}: second-run est_compile_s="
                  f"{second['est_compile_s']} exceeds "
                  f"{WARM_COMPILE_MAX_S}s — cache MISS", flush=True)
            ok = False
        else:
            print(f"# {name}: cache HIT (second-run est_compile_s="
                  f"{second['est_compile_s']})", flush=True)
    print(json.dumps({"probe": "cache_probe", "ok": ok}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
