"""Full-registry EXECUTION smoke at an arbitrary scale factor.

The correctness gate runs at sf0.01 (tools/verify_local.py); this tool
answers a different question: does every registered operator still
EXECUTE at a larger SF — no fixture-scale assumption baked in, no
quadratic blow-up past its documented bound, no OOM? Each key is driven
to completion with ``count()`` (full pipeline, no result comparison)
under a per-key wall-clock budget; over-budget keys are cancelled via
the Spark job group and reported, not failed — the documented
fixture-scale exhibits (exact all-pairs Jaccard etc.) are EXPECTED to
exceed budgets at 10x data, and the report is the evidence of which
ones do.

Usage:
    python tools/smoke_sf.py [sf_dir] [per_key_timeout_s] [key_substr ...]

Defaults: /root/testdata/sf0.1, 120 s per key, all registered keys.
Prints one line per key (ok/TIMEOUT/ERR + seconds + rows) and a final
summary; exit code 1 only on ERR (timeouts are report lines).

Per-round gate (VERDICT r7 item 7): also writes a diffable JSON
artifact — per-key {status, sec, rows} — to SMOKE_SF.json next to this
repo's other per-round artifacts, so scale regressions surface as a
diff rather than only through the 13 headline bench queries.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

_OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SMOKE_SF.json")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    substrs = sys.argv[3:]
    report: dict[str, dict] = {}

    from hive_test_spark.api import queries
    from hive_test_spark.session import get_spark

    qs = queries()
    keys = [k for k in qs if not substrs or any(s in k for s in substrs)]
    spark = get_spark("hts-smoke-sf")
    spark.sparkContext.setLogLevel("ERROR")

    n_ok = n_to = n_err = 0
    for key in keys:
        out: dict = {}

        def target(key=key, out=out):
            # Job group is thread-local on the driver: set it in the
            # thread that runs the action so cancelJobGroup reaches it.
            spark.sparkContext.setJobGroup(f"smoke:{key}", key, True)
            try:
                out["rows"] = qs[key](spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001 - report, don't raise
                out["err"] = f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"

        t0 = time.time()
        th = threading.Thread(target=target, daemon=True)
        th.start()
        th.join(budget)
        dt = time.time() - t0
        if th.is_alive():
            spark.sparkContext.cancelJobGroup(f"smoke:{key}")
            th.join(30)
            n_to += 1
            if th.is_alive():
                # The worker survived the cancel (driver-side loop or long
                # non-Spark work). Operators mutate session-global state
                # (USE db, conf set, CACHE TABLE), so a straggler thread
                # could corrupt later keys' results through the shared
                # session — recreate it before continuing (ADVICE r7).
                print(
                    f"TIMEOUT {key}: >{budget:.0f}s (cancel did not stop the "
                    f"worker; restarting session)",
                    flush=True,
                )
                spark.stop()
                spark = get_spark("hts-smoke-sf")
                spark.sparkContext.setLogLevel("ERROR")
                report[key] = {"status": "timeout_straggler", "sec": round(dt, 1)}
                continue
            print(f"TIMEOUT {key}: >{budget:.0f}s (cancelled)", flush=True)
            report[key] = {"status": "timeout", "sec": round(dt, 1)}
        elif "err" in out:
            # A cancelled job surfaces as an exception in the worker; a
            # late cancel race is still a timeout, not an error.
            if "cancelled" in out["err"].lower():
                n_to += 1
                print(f"TIMEOUT {key}: {dt:.1f}s (cancelled)", flush=True)
                report[key] = {"status": "timeout", "sec": round(dt, 1)}
            else:
                n_err += 1
                print(f"ERR {key}: {out['err']} ({dt:.1f}s)", flush=True)
                report[key] = {
                    "status": "err",
                    "sec": round(dt, 1),
                    "err": out["err"],
                }
        else:
            n_ok += 1
            print(f"ok {key}: {out['rows']} rows ({dt:.1f}s)", flush=True)
            report[key] = {"status": "ok", "sec": round(dt, 1), "rows": out["rows"]}

    print(
        f"\n== {n_ok} ok, {n_to} over-budget, {n_err} error "
        f"of {len(keys)} at {sf_dir} (budget {budget:.0f}s/key)"
    )
    if not substrs:  # full-registry runs only — partial runs would shadow
        with open(_OUT, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "budget_s": budget,
                    "summary": {"ok": n_ok, "timeout": n_to, "err": n_err},
                    "keys": report,
                },
                fh,
                indent=0,
                sort_keys=True,
            )
        print(f"wrote {_OUT}")
    sys.exit(1 if n_err else 0)


if __name__ == "__main__":
    main()
