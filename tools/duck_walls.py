#!/usr/bin/env python3
"""Dev-only appendix harness (VERDICT r9 item 9): time every oracle SQL
in DuckDB over the same parquet tables the Spark Bench reads, so the
"within 2x of baseline" bar gains a real per-query denominator (the
oracle harness already RUNS these queries for correctness; this records
their walls).

Usage: python3 tools/duck_walls.py <sfDir> <verifyOutDir> [outJson] [only]

`only` is an optional comma-separated query-name subset (e.g. the
top-20 engine walls at sf1 — running all 180 relational DP replays at
the 10x octave would take hours for no extra signal).

Writes {"sf": ..., "repeat": N, "walls": {name: sec}} with min-of-N
walls (default 2) to outJson (default DUCK_WALLS.json). A query whose
oracle errors records null. NOTE the caveat recorded in the JSON: the
oracle SQL replays kernels as relational DP chains (recursive CTEs,
per-cell joins) — faithful semantics, not how a native engine would
implement DTW — so per-query ratios are a sanity denominator for the
RELATIONAL queries (aggregation, dedup, joins), not a kernel-speed
comparison.
"""
import sys, os, json, time, threading
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
REPEAT = int(os.environ.get("DUCK_REPEAT", "2"))
# Optional per-query cap (seconds): a kernel-DP replay that is minutes at
# sf0.1 is hours at sf1 — an interrupted query records null (the JSON notes
# why). 0 = no cap (the sf0.1 full-suite record runs uncapped).
TIMEOUT_S = float(os.environ.get("DUCK_TIMEOUT_S", "0"))


def connect(sf_dir):
    con = duckdb.connect()
    # Bounded failure instead of host takedown (r16): at sf1 the
    # matrix-profile-family DP replays grew past 130 GB RSS — one filled
    # the disk with spill temp, the next got the whole process OOM-killed
    # 123 queries into a 159-query run (before the walls JSON was
    # written). A capped query raises OutOfMemoryException and records an
    # honest ERROR/null wall; the run survives. DUCK_MEM_LIMIT= (empty)
    # disables, preserving the uncapped sf0.1 record conditions.
    mem = os.environ.get("DUCK_MEM_LIMIT", "48GB")
    tmp = os.environ.get("DUCK_TMP_LIMIT", "40GB")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    if tmp:
        con.execute("SET temp_directory='.tmp_duck'")
        con.execute(f"SET max_temp_directory_size='{tmp}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table: directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 else "DUCK_WALLS.json"
    con = connect(sf_dir)
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if len(sys.argv) > 4:
        only = set(sys.argv[4].split(","))
        missing = only - set(oracle)
        if missing:
            sys.exit(f"unknown query names in `only`: {sorted(missing)}")
        oracle = {k: v for k, v in oracle.items() if k in only}
    walls = {}
    timed_out = []
    for name in sorted(oracle):
        best = None
        for _ in range(REPEAT):
            t0 = time.time()
            timer = None
            # Guard against the Timer racing query completion. The check
            # and the interrupt are ATOMIC under `lock` (ADVICE r15: the
            # earlier Event-only guard could pass is_set() just as
            # fetchall() returned, then interrupt the idle connection,
            # poisoning the NEXT query with a spurious InterruptException).
            # The lock cannot close the OTHER side of the race (ADVICE
            # r16): the timer can win the lock in the window after
            # fetchall() returns but before running.clear(), interrupting
            # the now-idle connection — so _interrupt records that it
            # FIRED, and the success path recreates the connection whenever
            # the flag is set (mirroring the timeout path), so a pending
            # interrupt can never be misrecorded as the NEXT query's
            # TIMEOUT.
            lock = threading.Lock()
            running = threading.Event()
            running.set()
            fired = [False]

            def _interrupt(ev=running, lk=lock, c=con, fd=fired):
                with lk:
                    if ev.is_set():
                        fd[0] = True
                        c.interrupt()

            if TIMEOUT_S > 0:
                timer = threading.Timer(TIMEOUT_S, _interrupt)
                timer.start()
            try:
                con.execute(oracle[name]).fetchall()
                with lock:
                    running.clear()
                    fired_now = fired[0]
                w = time.time() - t0
                best = w if best is None else min(best, w)
                if fired_now:
                    # interrupt landed between completion and clear():
                    # the wall is real (query finished) but the connection
                    # carries a pending interrupt — replace it
                    print(f"[duck] {name} completed as interrupt fired; "
                          "recreating connection", file=sys.stderr)
                    con = connect(sf_dir)
            except duckdb.InterruptException:
                # Classify timeouts by exception TYPE, not elapsed time: a
                # genuine error raised after TIMEOUT_S elapsed must stay an
                # ERROR, and an interrupt is a timeout regardless of clock.
                with lock:
                    running.clear()
                print(f"[duck] {name} TIMEOUT after {TIMEOUT_S}s", file=sys.stderr)
                timed_out.append(name)
                best = None
                con = connect(sf_dir)  # fresh connection: no leftover flag
                break
            except Exception as e:
                with lock:
                    running.clear()
                    fired_now = fired[0]
                print(f"[duck] {name} ERROR: {e}", file=sys.stderr)
                best = None
                if fired_now:  # pending interrupt must not leak to the next query
                    con = connect(sf_dir)
                break
            finally:
                if timer is not None:
                    timer.cancel()
        walls[name] = round(best, 3) if best is not None else None
        print(f"[duck] {name:28s} {walls[name]}")
    rec = {
        "sf": sf_dir,
        "repeat": REPEAT,
        "note": ("DuckDB walls of the oracle SQL (single-threaded-ish, "
                 "relational DP replays for kernel queries); denominator "
                 "for relational queries, sanity bound for kernel chains"),
        "walls": walls,
    }
    if TIMEOUT_S > 0:
        rec["timeout_s"] = TIMEOUT_S
        rec["timed_out"] = timed_out
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out_json}: {sum(1 for v in walls.values() if v is not None)}"
          f"/{len(walls)} timed")


if __name__ == "__main__":
    main()
