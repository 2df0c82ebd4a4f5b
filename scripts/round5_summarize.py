"""Summarize the round-5 session JSONLs into BENCH-ready tables.

Usage: python scripts/round5_summarize.py [5a|5b|5c|5d|5e|4j|all]
Prints markdown-ish tables from the committed receipts; keeps the
BENCH.md write-ups honest (numbers are produced from the files, not
retyped).
"""

from __future__ import annotations

import json
import os
import sys

S = os.path.dirname(os.path.abspath(__file__))


def rows(path):
    p = os.path.join(S, path)
    if not os.path.exists(p):
        return []
    out = []
    for line in open(p):
        line = line.strip()
        if line:
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def fmt(v):
    return "—" if v is None else v


def sum_5a():
    rs = rows("tpu_round5a_results.jsonl")
    print("== 5a end-stage assault ==")
    for r in rs:
        ph = r.get("phase")
        if ph in ("session_start", "session_done", "pipeline_done"):
            print(ph, {k: v for k, v in r.items() if k != "phase"})
        elif ph == "ladder":
            print(f"  P4 ladder stage {r['stage']}: mean {fmt(r.get('ep_end_steps_mean'))} "
                  f"p50 {fmt(r.get('ep_end_steps_p50'))} p90 {fmt(r.get('ep_end_steps_p90'))} "
                  f"ge8 {fmt(r.get('frac_ge_8'))} complete {fmt(r.get('frac_complete'))} "
                  f"n={r.get('episodes')}")
        elif ph == "eval":
            if r.get("skipped"):
                print(f"  FINAL eval stage {r.get('stage')}: SKIPPED")
            else:
                print(f"  FINAL eval stage {r.get('stage')}: mean {fmt(r.get('ep_end_steps_mean'))} "
                      f"p50 {fmt(r.get('ep_end_steps_p50'))} p90 {fmt(r.get('ep_end_steps_p90'))} "
                      f"ge8 {fmt(r.get('frac_ge_8'))} complete {fmt(r.get('frac_complete'))} "
                      f"n={r.get('episodes')} trunc={r.get('truncated')}")
        elif ph in ("reopen", "reanneal") and ("truncated_at" in r or
                                               "resumed_from" in r or
                                               "already_done_at" in r):
            print(f"  {ph}: {r}")


def sum_5b():
    rs = rows("tpu_round5b_results.jsonl")
    print("== 5b monkey seed-2 FULL schedule ==")
    last_stage = None
    for r in rs:
        ph = r.get("phase")
        if ph in ("session_start", "session_done"):
            print(ph, {k: v for k, v in r.items() if k not in ("phase", "evals")})
        elif ph == "monkey_main" and r.get("update") in (1, 2200) or \
                (ph == "monkey_main" and r.get("update", 0) % 500 == 0):
            print(f"  main u{r.get('update')}: rps {r.get('reward_per_step')} "
                  f"stage {r.get('mean_stage')} speed {r.get('speed')}")
            last_stage = r.get("mean_stage")
        elif ph == "bar_eval":
            print(f"  bar eval stage={fmt(r.get('stage'))}: bars mean {fmt(r.get('ep_end_bars_mean'))} "
                  f"p50 {fmt(r.get('ep_end_bars_p50'))} p90 {fmt(r.get('ep_end_bars_p90'))} "
                  f"stage_mean {fmt(r.get('stage_mean'))} n={r.get('episodes')} "
                  f"trunc={r.get('truncated')}")
    if last_stage is not None:
        print(f"  (last logged main-phase curriculum stage: {last_stage})")


def sum_5c():
    rs = rows("tpu_round5c_results.jsonl")
    print("== 5c Child3D ==")
    for r in rs:
        ph = r.get("phase")
        if ph == "train" and (r.get("update") in (1, 1200) or
                              r.get("update", 0) % 400 == 0):
            print(f"  {r.get('arm')} u{r.get('update')}: rps {r.get('reward_per_step')} "
                  f"z {r.get('z_mean')} speed {r.get('speed')}")
        elif ph in ("eval_det", "arm_done", "session_done", "arm_failed"):
            print(ph, {k: v for k, v in r.items() if k != "phase"})


def sum_5d():
    rs = rows("tpu_round5d_results.jsonl")
    print("== 5d drift horizon ==")
    for r in rs:
        if r.get("phase") in ("drift_horizon", "session_done"):
            print({k: v for k, v in r.items() if k != "phase"})


def sum_5e():
    rs = rows("tpu_round5e_results.jsonl")
    print("== 5e roofline ==")
    for r in rs:
        ph = r.get("phase")
        if ph == "equivalence":
            print(f"  eq {r.get('tag')}: med {r.get('median_dq')} p99 {r.get('p99_dq')} ok={r.get('ok')}")
        elif ph == "bench":
            print(f"  bench {r.get('tag')}: {r.get('env_steps_per_s')} steps/s "
                  f"({r.get('ms_per_control_step')} ms/ctrl)")
        elif ph in ("session_done", "mem_roofline", "arm_failed", "arm_rejected"):
            print(ph, {k: v for k, v in r.items() if k != "phase"})


def sum_4j():
    rs = rows("tpu_round4j_results.jsonl")
    print("== 4j capacity (512,512) ==")
    for r in rs:
        ph = r.get("phase")
        if ph == "eval":
            print(f"  eval stage {r.get('stage')}: mean {fmt(r.get('ep_end_steps_mean'))} "
                  f"ge8 {fmt(r.get('frac_ge_8'))} n={r.get('episodes')} "
                  f"frontier_finished={r.get('frontier_finished')}")
        elif ph in ("session_start", "session_done", "pipeline_done"):
            print(ph, {k: v for k, v in r.items() if k != "phase"})


ALL = {"5a": sum_5a, "5b": sum_5b, "5c": sum_5c, "5d": sum_5d,
       "5e": sum_5e, "4j": sum_4j}

which = sys.argv[1] if len(sys.argv) > 1 else "all"
for k, fn in ALL.items():
    if which in (k, "all"):
        fn()
        print()
