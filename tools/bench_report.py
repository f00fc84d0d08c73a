"""Regenerate the BASELINE.md per-round results table from the bench
artifacts of record (BENCH_r*.json) — every number traceable to a named
JSON file, no hand-transcription.

Usage: python tools/bench_report.py [repo_root]   # prints markdown
"""

from __future__ import annotations

import glob
import json
import os
import sys


def load_artifacts(root: str) -> list[tuple[str, dict]]:
    out = []
    for p in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        with open(p) as fh:
            d = json.load(fh)
        parsed = d.get("parsed") or _reparse_tail(d.get("tail")) or d
        out.append((os.path.basename(p), parsed))
    return out


def _reparse_tail(tail) -> dict | None:
    """Recover a truncated artifact (round 4: the stdout metrics line
    outgrew the driver's tail capture, so ``parsed`` is null and ``tail``
    begins mid-JSON).  The tail still holds every section from ``"sf"``
    onward as a valid object body — reattach the opening brace.  The
    per-query timings before the cut are lost; the headline sections
    (pipeline/merge/scaling) survive."""
    if not isinstance(tail, str):
        return None
    for anchor in ('"sf"', '"pipeline"'):
        i = tail.find(anchor)
        if i < 0:
            continue
        try:
            return json.loads("{" + tail[i:].strip())
        except ValueError:
            continue
    return None


def _fmt_eps(v) -> str:
    return f"{v / 1000:.1f}k ev/s" if isinstance(v, (int, float)) else "—"


def _get(d: dict, *path):
    for k in path:
        if not isinstance(d, dict) or k not in d:
            return None
        d = d[k]
    return d


def render(artifacts: list[tuple[str, dict]]) -> str:
    lines = [
        "| artifact of record | pipeline local[8] | scaling eff 2→8 | extract eff | MoR merge | CoW merge | kafka avro decode | minhash lsh | suite wall |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, p in artifacts:
        pipe = _fmt_eps(_get(p, "pipeline", "events_per_sec"))
        eff = _get(p, "scaling", "jobs", "pipeline", "efficiency")
        if eff is None:
            eff = _get(p, "scaling", "efficiency")
        valid = _get(p, "scaling", "jobs", "pipeline", "efficiency_valid")
        noisy = _get(p, "scaling", "jobs", "pipeline", "epoch_noisy")
        eff_s = "—" if eff is None else f"{eff}" + (
            "" if valid is None else (" ✓" if valid else " ✗")
        ) + (" (noisy)" if noisy else "")
        ext = _get(p, "scaling", "jobs", "extract", "efficiency")
        ext_s = "—" if ext is None else f"{ext}"
        mor = _fmt_eps(_get(p, "merge", "mor_events_per_sec"))
        cow = _fmt_eps(_get(p, "merge", "cow_events_per_sec"))
        kav = _fmt_eps(_get(p, "kafka_avro", "events_per_sec"))
        mh = _get(p, "queries", "doc_minhash_lsh")
        mh_s = f"{mh} s" if mh is not None else "—"
        wall = p.get("value")
        wall_s = f"{wall:.0f} s" if isinstance(wall, (int, float)) else "—"
        lines.append(
            f"| `{name}` | {pipe} | {eff_s} | {ext_s} | {mor} | {cow} | {kav} | {mh_s} | {wall_s} |"
        )
    return "\n".join(lines)


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    print(render(load_artifacts(root)))
