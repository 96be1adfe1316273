#!/usr/bin/env python3
"""sf0.1 -> sf1 (and sf1 -> sf10) wall-time ratio report (VERDICT r12 #1).

Reads two Bench harness json files and prints per-query fresh-time
ratios sorted worst-first, flagging anything above the gate
(default 15x for 10x data — shuffle-growth allowance). Queries under
`--floor` seconds in the SMALL run are reported but not gated: a 0.1 s
-> 2 s move is fixed-overhead amplification (extra partitions/stages on
a tiny query), not a scaling property of the operator.

Sentinel normalization (r14): when both files carry the fixed-point
sentinel fields (sentinel_*_agg_sec / sentinel_*_shuffle_sec — a
constant-size in-memory agg and shuffle run 3x at suite start and end),
the report prints the machine-speed factor between the two runs and a
sentinel-normalized ratio column. A broad drift that the sentinels also
show is the machine (hypervisor steal, co-tenants), not the engine;
the gate itself stays on the RAW ratio so normalization can never hide
a real regression behind a claimed-slow machine (the factor is capped
at 2x and printed for the reader to judge).

Usage: scale_ratio_report.py small.json big.json [gate] [floor]
"""
import json
import sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
gate = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5


def sentinel_speed(d):
    """Machine-speed scalar for one bench file: min of each sentinel's
    reps (min = least-noise), averaged over the 4 sentinel series.
    None when the file predates the sentinel fields."""
    keys = ["sentinel_start_agg_sec", "sentinel_start_shuffle_sec",
            "sentinel_end_agg_sec", "sentinel_end_shuffle_sec"]
    vals = [min(d[k]) for k in keys if d.get(k)]
    return sum(vals) / len(vals) if vals else None


s_speed, b_speed = sentinel_speed(small), sentinel_speed(big)
norm = None
if s_speed and b_speed:
    # cap at 2x: the sentinel corrects drift, it must not launder a
    # machine-was-4x-slower claim into a pass
    norm = max(min(b_speed / s_speed, 2.0), 0.5)
    print(f"sentinels: small={s_speed:.3f}s big={b_speed:.3f}s "
          f"machine factor={b_speed / s_speed:.2f} (normalizing by {norm:.2f}, "
          f"gate stays on raw ratios)")

def fresh(d, q):
    """Canonical fresh seconds, preferring untainted runs (r15).

    Since the fresh-taint policy (`fresh_taint_policy` in the bench
    header) the file's fresh_sec already IS the untainted replacement
    when healing fired (the tainted original sits in
    fresh_tainted_sec). Flag the row when even the canonical run was
    steal-tainted — one replacement max, so a still-starved machine
    shows up here instead of being laundered."""
    e = d["queries"][q]
    share = d.get("steal_taint_share", 0.20)
    cores = d.get("host_cores", 0)
    steal = e.get("steal_sec", -1.0)
    # mirror Bench.envTainted (r16): share-of-capacity, steal vs the
    # process's own cpu, and sys-dominance all mark the row
    user, syst = e.get("cpu_user_sec", -1.0), e.get("cpu_sys_sec", -1.0)
    cpu = e.get("cpu_sec", -1.0)
    is_tainted = (
        (cores and steal > share * e["fresh_sec"] * cores)
        or (cpu >= 0 and steal > max(1.0 * cpu, 2.0))
        or (user >= 0 and syst > max(1.0 * user, 3.0)))
    return e["fresh_sec"], ("T!" if is_tainted else
                            "h" if "fresh_tainted_sec" in e else "")


def wall_user_outliers(d, label, k=3.0, min_wall=1.0):
    """Per-board environmental adjudication on the cpu SPLIT (VERDICT
    r15 #4): the inflation class this VM exhibits is steal-INVISIBLE
    kernel sys time, so the 20% steal-share mark misses it. For every
    fresh row with a recorded cpu_user_sec, compute wall/user; rows
    whose ratio exceeds k x the board median (and wall >= min_wall, so
    sub-second rows can't trip on noise) are flagged as
    environmentally inflated — a judge adjudicates them from the
    artifact instead of rerunning the board."""
    ratios = {}
    for q, e in d["queries"].items():
        u = e.get("cpu_user_sec", -1.0)
        if u and u > 0.05:
            ratios[q] = e["fresh_sec"] / u
    if len(ratios) < 8:
        return set()
    med = sorted(ratios.values())[len(ratios) // 2]
    out = {q for q, r in ratios.items()
           if r > k * med and d["queries"][q]["fresh_sec"] >= min_wall}
    if out:
        print(f"{label}: {len(out)} fresh row(s) are wall/user OUTLIERS "
              f"(> {k:.0f}x board median {med:.2f} s-wall per user-core-s) — "
              f"environmental inflation, adjudicate on cpu_user_sec:")
        for q in sorted(out):
            e = d["queries"][q]
            print(f"  {q:34s} wall={e['fresh_sec']:.2f} "
                  f"user={e.get('cpu_user_sec', -1):.2f} "
                  f"sys={e.get('cpu_sys_sec', -1):.2f} "
                  f"steal={e.get('steal_sec', -1):.2f} "
                  f"(wall/user={e['fresh_sec'] / e['cpu_user_sec']:.1f})")
    return out


sq, bq = small["queries"], big["queries"]
env_small = wall_user_outliers(small, f"small ({sys.argv[1]})")
env_big = wall_user_outliers(big, f"big ({sys.argv[2]})")
shared = sorted(set(sq) & set(bq))
healed = sum(1 for d in (small, big) for q in d["queries"]
             if "fresh_tainted_sec" in d["queries"][q])
if healed:
    print(f"{healed} fresh run(s) were steal-healed (h = replacement used; "
          f"T! = canonical fresh itself tainted — adjudicate by cpu_sec)")
rows = []
for q in shared:
    (s, s_mark), (b, b_mark) = fresh(small, q), fresh(big, q)
    # prefer warm_min when both sides have it (JIT/codegen noise out)
    if "warm_min_sec" in sq[q] and "warm_min_sec" in bq[q]:
        s2, b2 = sq[q]["warm_min_sec"], bq[q]["warm_min_sec"]
    else:
        s2, b2 = s, b
    # engine-attributable growth: the user-cpu ratio is immune to the
    # sys-inflation class; E marks a wall/user outlier row (see above)
    su, bu = sq[q].get("cpu_user_sec", -1.0), bq[q].get("cpu_user_sec", -1.0)
    u_ratio = bu / su if (su and bu and su > 0.05 and bu > 0) else None
    env = ("E" if q in env_small or q in env_big else "")
    rows.append((q, s, b, b / max(s, 1e-9), s2, b2, b2 / max(s2, 1e-9),
                 ((s_mark + b_mark) or "") + env, u_ratio))

rows.sort(key=lambda r: -min(r[3], r[6]))
fails = 0
print(f"{'query':34s} {'small':>8s} {'big':>8s} {'ratio':>7s} "
      f"{'warm_s':>8s} {'warm_b':>8s} {'w_ratio':>7s} {'u_ratio':>7s}" +
      (f" {'n_ratio':>7s}" if norm else ""))
for q, s, b, r, s2, b2, r2, mark, u_ratio in rows:
    eff = min(r, r2)  # a query passes if EITHER fresh or warm scales
    flag = ""
    if eff > gate and s >= floor:
        flag = " <<< OVER GATE"
        fails += 1
        # the gate stays on wall (normalization never hides a real
        # regression) but the artifact itself says when the user-cpu
        # split contradicts the wall reading — hypervisor class
        if u_ratio is not None and u_ratio <= gate * 0.5:
            flag += f" [wall/user disagree: user-cpu ratio {u_ratio:.1f} — hypervisor class]"
    elif eff > gate:
        flag = " (small-base, not gated)"
    utail = f" {u_ratio:7.1f}" if u_ratio is not None else f" {'-':>7s}"
    ntail = f" {r / norm:7.1f}" if norm else ""
    mtail = f" {mark}" if mark else ""
    print(f"{q:34s} {s:8.2f} {b:8.2f} {r:7.1f} {s2:8.2f} {b2:8.2f} {r2:7.1f}{utail}{ntail}{flag}{mtail}")

missing = sorted(set(sq) - set(bq))
failed_big = big.get("failed", [])
print(f"\nshared={len(shared)} gate={gate}x floor={floor}s "
      f"over_gate={fails} big_failed={failed_big} missing_in_big={missing[:10]}")
sys.exit(1 if (fails or failed_big) else 0)
