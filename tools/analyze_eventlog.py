"""Attribute per-stage time to bench sections from a Spark event log.

Usage:
  python tools/analyze_eventlog.py <eventlog-file> [section]

Without a section: per-section wall-clock summed over stage runtimes
(rep0 only, matching the bench's first sample) ranked descending.
With a section: that section's stages ranked by duration with their
callsites, task counts, and shuffle bytes — the "which operator inside
the section is hot" view (guide §1.1/§7.1 without a live UI).
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def load(path: str):
    job_desc: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    stages: dict[int, dict] = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                job_desc[jid] = props.get("spark.job.description", "")
                for sinfo in ev.get("Stage Infos", []):
                    stage_job.setdefault(sinfo["Stage ID"], jid)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None or comp is None:
                    continue
                # MERGE into any dict the TaskEnd branch already
                # accumulated (task-end events precede stage-completion
                # in the log; replacing the dict zeroed exec/fetch/shW
                # in the focus view — ADVICE r11 item 1)
                st = stages.setdefault(sid, {})
                st.update({
                    "ms": comp - sub,
                    "name": si.get("Stage Name", ""),
                    "tasks": si.get("Number of Tasks", 0),
                    "details": (si.get("Details") or "").splitlines()[:6],
                })
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                srm = tm.get("Shuffle Read Metrics") or {}
                swm = tm.get("Shuffle Write Metrics") or {}
                st = stages.setdefault(sid, {})
                st["sh_read"] = st.get("sh_read", 0) + srm.get(
                    "Remote Bytes Read", 0
                ) + srm.get("Local Bytes Read", 0)
                st["sh_write"] = st.get("sh_write", 0) + swm.get(
                    "Shuffle Bytes Written", 0
                )
                st["fetch_ms"] = st.get("fetch_ms", 0) + srm.get(
                    "Fetch Wait Time", 0
                )
                st["exec_ms"] = st.get("exec_ms", 0) + tm.get(
                    "Executor Run Time", 0
                )
    return job_desc, stage_job, stages


def main():
    path = sys.argv[1]
    focus = sys.argv[2] if len(sys.argv) > 2 else None
    job_desc, stage_job, stages = load(path)

    def section_of(sid: int) -> str:
        d = job_desc.get(stage_job.get(sid, -1), "")
        if d.startswith("bench:"):
            return d  # bench:<name>:rep<i>
        return d or "(unlabeled)"

    if focus is None:
        per = defaultdict(float)
        for sid, st in stages.items():
            if "ms" not in st:
                continue
            desc = section_of(sid)
            if desc.startswith("bench:"):
                _, name, rep = desc.split(":", 2)
                key = f"{name}" if rep == "rep0" else None
            else:
                key = desc
            if key:
                per[key] += st["ms"] / 1000.0
        for name, sec in sorted(per.items(), key=lambda kv: -kv[1]):
            print(f"{sec:9.2f}s  {name}")
    else:
        rows = []
        for sid, st in stages.items():
            if "ms" not in st:
                continue
            desc = section_of(sid)
            if desc.startswith(f"bench:{focus}:"):
                rows.append((st["ms"], sid, desc, st))
        rows.sort(reverse=True)
        for ms, sid, desc, st in rows:
            print(
                f"{ms / 1000:8.2f}s stage={sid} tasks={st.get('tasks')} "
                f"exec={st.get('exec_ms', 0) / 1000:.1f}s "
                f"fetch={st.get('fetch_ms', 0) / 1000:.1f}s "
                f"shR={st.get('sh_read', 0) >> 20}MB "
                f"shW={st.get('sh_write', 0) >> 20}MB  {desc}"
            )
            print(f"          {st.get('name', '')}")
            for ln in st.get("details", [])[:3]:
                print(f"          | {ln.strip()}")


if __name__ == "__main__":
    main()
